"""Graph materialization: canonical node / edge tables (north_star
"materializing node/edge Iceberg tables").

Oracle spec: ner_spark/fixtures/build.py writes ``nodes.parquet`` /
``edges.parquet`` from the union-find canonical map; this module is the
distributed equivalent over the pipeline's DataFrames.

Schemas:
* nodes: (entity_id, entity_type, canonical_name, n_surfaces, n_mentions)
  — entity_id is the component minimum node_id (deterministic under any
  partitioning), n_surfaces = distinct member surfaces, n_mentions = total
  mention occurrences absorbed by the entity.
* edges: (src_entity, pred, dst_entity, n_turns) — relation rows (distinct
  per turn) rewritten to canonical endpoints and counted.

All joins key on node_id / norm-key (high-cardinality, near-unique) and
the component map is tiny relative to mentions — broadcastable below
``spark.sql.autoBroadcastJoinThreshold``, AQE otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ner_spark.operators.linking import normalize_surface_col


def _split_type(col):
    return F.substring_index(col, "|", 1)


def _split_name(col):
    return F.regexp_replace(col, r"^[^|]*\|", "")


def materialize_nodes(nodes: DataFrame, assignment: DataFrame) -> DataFrame:
    """nodes (per-surface) × assignment (node_id→component) → entity table."""
    n = nodes.join(assignment, "node_id")
    return (
        n.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_surfaces"),
            F.sum("mention_count").alias("n_mentions"),
        )
        .select(
            F.col("component").alias("entity_id"),
            _split_type(F.col("component")).alias("entity_type"),
            _split_name(F.col("component")).alias("canonical_name"),
            "n_surfaces",
            "n_mentions",
        )
    )


def materialize_edges(relations: DataFrame, assignment: DataFrame) -> DataFrame:
    """Distinct relation rows rewritten to canonical endpoints; weight =
    the number of DISTINCT TURNS asserting the canonical edge. Two
    surface variants in the same turn ('Acme'/'ACME Inc') canonicalize to
    one edge and must count that turn once — a raw row count would
    inflate the weight."""
    rel = relations.distinct()
    t = rel.withColumn(
        "subj_key",
        F.concat_ws("|", F.col("subj_type"), normalize_surface_col(F.col("subj"))),
    ).withColumn(
        "obj_key",
        F.concat_ws("|", F.col("obj_type"), normalize_surface_col(F.col("obj"))),
    )
    amap = assignment.select(
        F.col("node_id").alias("subj_key"), F.col("component").alias("src_entity")
    )
    bmap = assignment.select(
        F.col("node_id").alias("obj_key"), F.col("component").alias("dst_entity")
    )
    return (
        t.join(amap, "subj_key")
        .join(bmap, "obj_key")
        .groupBy("src_entity", F.col("pred"), "dst_entity")
        .agg(F.countDistinct("conv_id", "turn_idx").alias("n_turns"))
    )
