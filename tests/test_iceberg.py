"""Iceberg-catalog mode (sources/iceberg.py): runs end-to-end where the
iceberg-spark-runtime jar exists, SKIPS where it does not (this sandbox
ships none — the parquet + manifest-protocol fallback is the tested
default everywhere else in the suite)."""

from __future__ import annotations

import pytest

from ner_spark.sources.iceberg import iceberg_jar_available

pytestmark = pytest.mark.skipif(
    not iceberg_jar_available(),
    reason="no iceberg-spark-runtime jar on the classpath (sandbox fallback "
    "= parquet dirs + manifest protocol, covered by test_kg_stages)",
)


def test_conf_shape():
    from ner_spark.sources.iceberg import iceberg_conf

    c = iceberg_conf("/tmp/wh")
    assert c["spark.sql.catalog.ice.type"] == "hadoop"


def test_pipeline_triples_snapshot_roundtrip(tmp_path, fixtures_small):
    """Full catalog mode: dedicated session with the Iceberg extensions,
    triples published as an Iceberg table, append creates a second
    snapshot, and time travel reads back the first."""
    from ner_spark.operators.extraction import mentions_to_triples
    from ner_spark.pipeline import build_mentions
    from ner_spark.session import get_spark
    from ner_spark.sources.iceberg import (
        append_table,
        iceberg_conf,
        read_snapshot,
        read_table,
        snapshots,
        write_table,
    )

    spark = get_spark(
        master="local[2]", extra_conf=iceberg_conf(str(tmp_path / "wh"))
    )
    t = spark.read.parquet(f"{fixtures_small}/transcripts.parquet")
    triples = mentions_to_triples(build_mentions(t))
    write_table(triples, "db.triples")
    n1 = read_table(spark, "db.triples").count()
    assert n1 > 0

    append_table(triples.limit(10), "db.triples")
    snaps = snapshots(spark, "db.triples").orderBy("committed_at").collect()
    assert len(snaps) == 2
    assert read_snapshot(spark, "db.triples", snaps[0]["snapshot_id"]).count() == n1
    assert read_table(spark, "db.triples").count() == n1 + 10
