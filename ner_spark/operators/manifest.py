"""M5 — per-partition lineage manifest + idempotent stage resume.

The reference's only lineage is an append-only run log
(/root/reference/train_lstm_crf.py:13-24, ckpt/run.log) plus TF
checkpoints for restart (train_lstm_crf.py:198-200). The north_star
upgrades that to a **manifest table**: one row per (run, stage,
partition) with input/output row counts and a status, so any stage of
the pipeline resumes idempotently (FIXTURES.md F8).

Protocol (write-audit-publish, Iceberg-style without requiring an
Iceberg catalog in the sandbox — plain parquet dirs stand in):

1. a stage computes its output DataFrame and writes it to
   ``<out>/<stage>/data`` with ``mode=overwrite`` (atomic publish per
   stage directory);
2. per-partition metrics are collected from the *written* data
   (``spark_partition_id()`` groupBy — this is the lineage evidence, not
   an estimate) and appended to the manifest with status ``complete``;
3. on resume, a stage whose manifest shows ``complete`` for this run and
   whose data dir exists is **skipped** and its output re-read — making
   re-runs idempotent and partial failures re-entrant: an interrupted
   stage has no ``complete`` row, so it recomputes and its overwrite
   replaces any torn output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
        # configuration/model fingerprint the stage ran under (e.g. the
        # weights-artifact version): a resume only honors rows whose
        # fingerprint matches the current run's, so publishing new model
        # weights invalidates manifests written under the old ones.
        # Nullable: manifests from before this column read as null ≡ "".
        T.StructField("fingerprint", T.StringType(), True),
    ]
)


def manifest_path(out_dir: str) -> str:
    # NOTE: no leading underscore — Spark's file index silently ignores
    # `_`-prefixed paths (metadata convention), which would make the
    # manifest read back empty.
    return os.path.join(out_dir, "manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    path = manifest_path(out_dir)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def _dir_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API — correct for
    hdfs:// / s3a:// / file:// alike. A driver-local ``os.path.isdir``
    would silently report False for every distributed path, turning
    resume into full recomputation on a real cluster."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def stage_complete(
    spark: SparkSession, out_dir: str, run_id: str, stage: str,
    fingerprint: str = "",
) -> bool:
    """A stage is complete iff its LATEST manifest activity is a
    ``complete`` publish under the SAME fingerprint. The manifest is
    append-only, so a re-publish under a different fingerprint cannot
    retract the old rows — instead every publish first appends a
    ``superseded`` marker (see ``publish_stage``), and completeness
    requires the matching complete rows to be NEWER than any marker:
    a rollback to an earlier fingerprint after a re-publish correctly
    recomputes instead of serving the newer fingerprint's data, and a
    crash between the marker and the new complete rows leaves the stage
    incomplete rather than pointing old rows at torn new data."""
    m = read_manifest(spark, out_dir).where(
        (F.col("run_id") == run_id) & (F.col("stage") == stage)
    )
    row = m.agg(
        F.max(
            F.when(
                (F.col("status") == "complete")
                & (F.coalesce(F.col("fingerprint"), F.lit("")) == fingerprint),
                F.col("updated_at"),
            )
        ).alias("last_ok"),
        F.max(
            F.when(F.col("status") == "superseded", F.col("updated_at"))
        ).alias("last_marker"),
    ).collect()[0]
    if row["last_ok"] is None:
        return False
    if row["last_marker"] is not None and row["last_marker"] >= row["last_ok"]:
        return False
    return _dir_exists(spark, stage_data_path(out_dir, run_id, stage))


def stage_data_path(out_dir: str, run_id: str, stage: str) -> str:
    # run-scoped: two runs sharing an out_dir must not overwrite each
    # other's published data — a resume of run A after run B wrote the
    # same stage would otherwise silently return run B's output.
    return os.path.join(out_dir, run_id, stage, "data")


def _partition_metrics(df: DataFrame) -> DataFrame:
    return df.groupBy(
        F.spark_partition_id().alias("partition_id")
    ).agg(F.count(F.lit(1)).alias("rows"))


def publish_stage(
    df: DataFrame, out_dir: str, run_id: str, stage: str,
    fingerprint: str = "",
) -> DataFrame:
    """Write a stage's output + its per-partition manifest rows; return
    the re-read (published) DataFrame so downstream stages consume the
    materialized data, truncating lineage between stages. An EMPTY stage
    still publishes one sentinel row (partition -1, 0 rows) — without it
    a legitimately-empty stage is indistinguishable from an interrupted
    one and would recompute on every resume."""
    spark = df.sparkSession
    path = stage_data_path(out_dir, run_id, stage)
    # write-audit-publish step 0: retract any prior completeness BEFORE
    # touching the data dir. The manifest is append-only, so this is a
    # 'superseded' marker row; stage_complete requires complete rows to
    # be newer than the latest marker, which (a) invalidates an older
    # fingerprint's rows the moment a re-publish starts and (b) leaves
    # the stage incomplete if we crash mid-overwrite.
    spark.createDataFrame(
        [(run_id, stage, -1, 0, "superseded", fingerprint)],
        "run_id string, stage string, partition_id int, rows long, "
        "status string, fingerprint string",
    ).withColumn("updated_at", F.current_timestamp()).select(
        [f.name for f in MANIFEST_SCHEMA.fields]
    ).write.mode("append").parquet(manifest_path(out_dir))
    df.write.mode("overwrite").parquet(path)
    published = spark.read.parquet(path)
    metrics = (
        _partition_metrics(published)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("stage", F.lit(stage))
        .withColumn("status", F.lit("complete"))
        .withColumn("updated_at", F.current_timestamp())
        .withColumn("fingerprint", F.lit(fingerprint))
        .select([f.name for f in MANIFEST_SCHEMA.fields])
    )
    sentinel = spark.createDataFrame(
        [(run_id, stage, -1, 0, "complete", fingerprint)],
        "run_id string, stage string, partition_id int, rows long, "
        "status string, fingerprint string",
    ).withColumn("updated_at", F.current_timestamp()).select(
        [f.name for f in MANIFEST_SCHEMA.fields]
    )
    metrics.unionByName(sentinel).write.mode("append").parquet(
        manifest_path(out_dir)
    )
    return published


def run_stage(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    stage: str,
    compute,
    resume: bool = True,
    fingerprint: str = "",
) -> DataFrame:
    """Execute ``compute() -> DataFrame`` under the resume protocol. A
    stage only resumes when its manifest row carries the SAME
    ``fingerprint`` (e.g. the active weights-artifact version) — a
    version bump forces recompute of every stage in the run."""
    if resume and stage_complete(spark, out_dir, run_id, stage, fingerprint):
        return spark.read.parquet(stage_data_path(out_dir, run_id, stage))
    return publish_stage(compute(), out_dir, run_id, stage, fingerprint)
