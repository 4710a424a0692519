"""Optional Iceberg catalog integration (gated on runtime availability).

SURVEY §1.4 specifies Iceberg tables as the at-rest format of the
production pipeline (transcripts in, triples/nodes/edges/manifest out).
The sandbox ships no ``iceberg-spark-runtime`` jar, so the engine runs
on plain parquet directories with the manifest protocol
(operators/manifest.py) standing in for snapshot semantics — this module
is the real-catalog path that activates wherever the jar exists:

* ``iceberg_conf()`` returns the session configs for a Hadoop-catalog
  Iceberg deployment (SQL extensions + catalog + warehouse) — pass them
  to ``get_spark(extra_conf=...)`` BEFORE the JVM starts;
* ``write_table``/``append_table`` publish DataFrames as Iceberg tables
  (atomic snapshot commits — the property the manifest protocol's
  overwrite-then-publish emulates);
* ``snapshots``/``read_snapshot`` expose time travel, which subsumes the
  manifest's resume check: a stage is complete iff its table has a
  snapshot for this run.

Everything here is exercised by tests/test_iceberg.py, which SKIPS when
the jar is absent (this sandbox) and runs end-to-end where it is
present — keeping the parquet fallback the tested default everywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CATALOG = "ice"

_RUNTIME_JAR_MARKERS = ("iceberg-spark-runtime", "iceberg-spark3-runtime")


def iceberg_jar_available() -> bool:
    """True when an Iceberg Spark runtime jar is on the classpath —
    checked by filename in the pyspark jars dir and ``SPARK_HOME/jars``
    (the places spark-submit loads from without ``--packages``)."""
    import pyspark

    dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    sh = os.environ.get("SPARK_HOME")
    if sh:
        dirs.append(os.path.join(sh, "jars"))
    for d in dirs:
        try:
            for f in os.listdir(d):
                if any(m in f for m in _RUNTIME_JAR_MARKERS):
                    return True
        except OSError:
            pass
    return False


def iceberg_conf(warehouse: str, catalog: str = DEFAULT_CATALOG) -> dict[str, str]:
    """Session configs for a Hadoop-catalog Iceberg setup. Must be set at
    session build time (SQL extensions are JVM-launch configs)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def _qualify(table: str, catalog: str) -> str:
    return table if "." in table else f"{catalog}.{table}"


def write_table(df: DataFrame, table: str, catalog: str = DEFAULT_CATALOG) -> None:
    """Create-or-replace the table in one atomic snapshot commit."""
    df.writeTo(_qualify(table, catalog)).using("iceberg").createOrReplace()


def append_table(df: DataFrame, table: str, catalog: str = DEFAULT_CATALOG) -> None:
    df.writeTo(_qualify(table, catalog)).append()


def read_table(
    spark: SparkSession, table: str, catalog: str = DEFAULT_CATALOG
) -> DataFrame:
    return spark.read.table(_qualify(table, catalog))


def snapshots(
    spark: SparkSession, table: str, catalog: str = DEFAULT_CATALOG
) -> DataFrame:
    """The table's snapshot log (committed_at, snapshot_id, operation)."""
    return spark.sql(f"SELECT * FROM {_qualify(table, catalog)}.snapshots")


def read_snapshot(
    spark: SparkSession,
    table: str,
    snapshot_id: int,
    catalog: str = DEFAULT_CATALOG,
) -> DataFrame:
    """Time travel: the table exactly as of ``snapshot_id``."""
    return (
        spark.read.option("snapshot-id", str(snapshot_id))
        .table(_qualify(table, catalog))
    )
