"""Bucketed co-located joins: both sides bucketed on the join key must
join with ZERO Exchange, and results equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, fixtures_small, tmp_path_factory):
    from ner_spark.operators.extraction import mentions_to_triples
    from ner_spark.pipeline import build_mentions
    from ner_spark.sources.bucketed import write_bucketed

    wh = str(tmp_path_factory.mktemp("wh"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buck LOCATION '{wh}'")
    t = spark.read.parquet(f"{fixtures_small}/transcripts.parquet")
    triples = mentions_to_triples(build_mentions(t))
    write_bucketed(
        t.select("conv_id", "turn_idx", "role", "text"),
        "buck.transcripts_b",
        ["conv_id"],
        n_buckets=8,
    )
    write_bucketed(triples, "buck.triples_b", ["conv_id"], n_buckets=8)
    yield "buck.transcripts_b", "buck.triples_b"
    spark.sql("DROP DATABASE buck CASCADE")


def test_bucketed_join_is_exchange_free_and_correct(spark, bucketed_tables):
    from ner_spark.sources.bucketed import colocated_join, is_exchange_free_join

    left, right = bucketed_tables
    # disable broadcast so the plan demonstrates bucketing, not dim size
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = colocated_join(spark, left, right, ["conv_id"])
        assert is_exchange_free_join(j), j._jdf.queryExecution().executedPlan().toString()

        # same rows as the plain (shuffled) join of the raw frames
        n_bucketed = j.count()
        plain = spark.table(left).join(
            spark.table(right).hint("merge"), "conv_id"
        )
        assert n_bucketed == plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
