"""M2 — open relation extraction over per-turn mention sequences.

The reference emits flat ``(attribute_type, mention_text)`` pairs per
sentence (/root/reference/utils.py:544-578); the KG pipeline turns
co-occurring mentions into ``(subj, pred, obj)`` triples using typed
pattern rules (SURVEY §3 M2, north_star "dependency/pattern-based open
relation extractor"). Semantics are specified by the Spark-free oracle
``ner_spark.kg.relate_mentions``: every ordered pair of mentions in one
turn whose subject span starts strictly before the object span, matched
against the (subj_type, obj_type) -> predicate rule table.

Physical plan (scale rationale):
* mentions explode is row-local (no shuffle);
* the pair-generation self-join keys on (conv_id, turn_idx) — high
  cardinality, near-uniform (mentions per turn is small and bounded), so
  the shuffle is well distributed even when one conv_id is hot: the key
  includes turn_idx, which is exactly why we do NOT need conv-level
  salting here;
* the rule table is 8 rows → explicit ``broadcast`` so Catalyst plans a
  BroadcastHashJoin, never a shuffle, and applies the rule filter during
  the pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.kg import REL_RULES


def rules_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(s, o, p) for (s, o), p in sorted(REL_RULES.items())],
        "subj_type string, obj_type string, predicate string",
    )


def explode_mentions(mentions_df: DataFrame, mentions_col: str = "mentions") -> DataFrame:
    """(conv_id, turn_idx, mentions array<struct>) -> one row per mention
    occurrence, keeping the span anchor. ``pred`` in the mention struct is
    the entity *type* (the reference's attribute name, utils.py:558)."""
    return mentions_df.select(
        "conv_id",
        "turn_idx",
        F.explode(mentions_col).alias("m"),
    ).select(
        "conv_id",
        "turn_idx",
        F.col("m.pred").alias("mtype"),
        F.col("m.obj").alias("mtext"),
        F.col("m.span_start").alias("span_start"),
        F.col("m.span_end").alias("span_end"),
    )


def extract_relations(mentions_df: DataFrame, mentions_col: str = "mentions") -> DataFrame:
    """Per-turn typed relations.

    Returns (conv_id, turn_idx, subj_type, subj, predicate, obj_type, obj)
    with one row per matched ordered mention pair (duplicates preserved,
    matching the oracle's list semantics).
    """
    spark = mentions_df.sparkSession
    m = explode_mentions(mentions_df, mentions_col)
    a = m.select(
        "conv_id",
        "turn_idx",
        F.col("mtype").alias("subj_type"),
        F.col("mtext").alias("subj"),
        F.col("span_start").alias("subj_start"),
    )
    b = m.select(
        "conv_id",
        "turn_idx",
        F.col("mtype").alias("obj_type"),
        F.col("mtext").alias("obj"),
        F.col("span_start").alias("obj_start"),
    )
    return (
        a.join(b, ["conv_id", "turn_idx"])
        .where(F.col("subj_start") < F.col("obj_start"))
        .join(F.broadcast(rules_df(spark)), ["subj_type", "obj_type"])
        .select(
            "conv_id",
            "turn_idx",
            "subj_type",
            "subj",
            F.col("predicate").alias("pred"),
            "obj_type",
            "obj",
        )
    )


def relations_to_triples(relations_df: DataFrame) -> DataFrame:
    """Mention-level relations as (subj, pred, obj) triple rows (distinct
    per turn, mirroring the reference's per-sentence pair-set dedup)."""
    return relations_df.select(
        "conv_id",
        "turn_idx",
        "subj",
        "pred",
        "obj",
        "subj_type",
        "obj_type",
    ).distinct()
