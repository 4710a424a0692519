"""M3 — blocking + MinHash-LSH candidate generation + link scoring.

Entity linking over mention surfaces: normalize → char-shingle → MinHash
signature → banded blocking keys → band self-join → Jaccard verification.
The exact hash spec lives in the Spark-free oracle ``ner_spark.kg``
(md5-based so Python / Spark SQL / DuckDB compute identical integers);
this module is the distributed implementation and must agree bit-for-bit.

Scale design (the part the reference, a single-box repo, never had):
* signatures are computed **row-locally** with higher-order array
  functions (``transform`` over ``sequence`` + ``array_min``) — the
  shingle set never explodes into rows, so MinHash costs zero shuffle;
* the only wide operation is the band-key self-join. Band keys are
  ``entity_type|band|h1-h2-h3`` — high cardinality; residual hot buckets
  (stop-surface bands) are handled by ``max_band_bucket`` which drops
  pathological buckets (standard LSH stop-band practice at 10^12-turn
  scale; off by default so small-scale results match the oracle exactly)
  plus AQE skew-join splitting from the session defaults;
* the verify score is computed INSIDE the band join (once per band
  collision, row-local and cheap) and the (node_a, node_b) dedup runs
  after it, so the dedup exchange carries slim scored rows — never the
  shingle arrays (same score-then-dedup ordering as
  ``functions.similarity.ivf_cosine_dup_pairs``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ner_spark.kg import (
    BAND_ROWS,
    H31_MASK,
    JACCARD_THRESHOLD,
    MERSENNE61,
    MINHASH_A,
    MINHASH_B,
    N_BANDS,
    N_HASHES,
    NORM_SUFFIX_PATTERN,
)

# ---------------------------------------------------------------------------
# column-level building blocks (all row-local, JVM-side)
# ---------------------------------------------------------------------------


def normalize_surface_col(col: Column) -> Column:
    """Spark restatement of ``kg.normalize_surface``: lower, collapse
    whitespace, strip a trailing legal suffix (the reference's only
    normalization is lower-casing, torch_version/data_tools.py:157-159;
    the suffix/whitespace rules are our linking keys)."""
    s = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.regexp_replace(s, NORM_SUFFIX_PATTERN, "")


def md5_hash60_col(col: Column) -> Column:
    """First 15 md5 hex digits as a 60-bit long — same integer as
    ``kg.md5_hash60`` and DuckDB ``('0x'||substring(md5(s),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def char_shingles_expr(col: Column, k: int = 3) -> Column:
    """Distinct char k-grams (whole string when shorter than k). Mirrors
    ``kg.char_shingles`` (element order differs — consumers treat the
    array as a set). Row-local higher-order functions, no UDF."""
    return F.when(F.length(col) < k, F.array(col)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - (k - 1)),
                lambda i: col.substr(i, F.lit(k)),
            )
        )
    )


def shingle_hashes_col(shingles: Column) -> Column:
    """array<long>: one 31-bit md5-derived hash per shingle — the single
    digest pass MinHash permutes arithmetically (kg.minhash_signature)."""
    return F.transform(
        shingles, lambda sh: md5_hash60_col(sh).bitwiseAND(F.lit(H31_MASK))
    )


def minhash_sig_from_hashes(hashes: Column, n_hashes: int = N_HASHES) -> Column:
    """array<long> length ``n_hashes``; element i =
    min over shingle hashes h of (a_i*h + b_i) mod M61. Row-local, pure
    64-bit arithmetic — no digest work beyond the one pass in
    ``shingle_hashes_col``, which is let-bound so project collapse cannot
    re-inline the md5 pass once per signature element."""
    from ner_spark.functions.colutil import let

    def perm(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE61)

    return let(
        hashes,
        lambda hs: F.array(
            *[
                F.array_min(F.transform(hs, perm(MINHASH_A[i], MINHASH_B[i])))
                for i in range(n_hashes)
            ]
        ),
    )


def minhash_sig_col(shingles: Column, n_hashes: int = N_HASHES) -> Column:
    return minhash_sig_from_hashes(shingle_hashes_col(shingles), n_hashes)


def band_keys_col(entity_type: Column, sig: Column) -> Column:
    """array<string> of N_BANDS keys ``type|band|h-h-h`` (kg.band_keys).
    ``sig`` is let-bound: each band slices the SAME evaluated signature,
    so an inlined upstream signature expression is computed once."""
    from ner_spark.functions.colutil import let

    return let(
        sig,
        lambda s: F.transform(
            F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
            lambda b: F.concat(
                entity_type,
                F.lit("|"),
                b.cast("string"),
                F.lit("|"),
                F.array_join(
                    F.transform(
                        F.slice(s, b * BAND_ROWS + 1, BAND_ROWS),
                        lambda h: h.cast("string"),
                    ),
                    "-",
                ),
            ),
        ),
    )


def jaccard_col(a: Column, b: Column) -> Column:
    u = F.size(F.array_union(a, b))
    return F.when(u == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(a, b)) / u
    )


@pandas_udf(T.DoubleType())
def _pandas_jaccard(a_s: pd.Series, b_s: pd.Series) -> pd.Series:
    out = []
    for a, b in zip(a_s, b_s):
        sa, sb = set(a), set(b)
        u = len(sa | sb)
        # int/int division — bit-identical to the JVM size/size double
        out.append(len(sa & sb) / u if u else 0.0)
    return pd.Series(out, dtype="float64")


# ---------------------------------------------------------------------------
# stage operators
# ---------------------------------------------------------------------------


def mention_nodes(mentions_exploded: DataFrame) -> DataFrame:
    """Distinct typed entity nodes from mention occurrences.

    Input: one row per mention occurrence with columns ``mtype``/``mtext``
    (the exploded extraction output). node_id = ``type|normalized_surface``
    (kg.node_key) — identical surfaces collapse before linking, so LSH
    runs on unique nodes only (at scale: |nodes| << |mentions|)."""
    nodes = mentions_exploded.select(
        F.col("mtype").alias("entity_type"), F.col("mtext").alias("surface")
    ).withColumn("norm", normalize_surface_col(F.col("surface")))
    return (
        nodes.groupBy("entity_type", "norm")
        .agg(
            F.count(F.lit(1)).alias("mention_count"),
            F.min("surface").alias("canonical_surface"),
        )
        .withColumn(
            "node_id", F.concat_ws("|", F.col("entity_type"), F.col("norm"))
        )
    )


def with_signatures(nodes_df: DataFrame, norm_col: str = "norm") -> DataFrame:
    sh = char_shingles_expr(F.col(norm_col))
    return (
        nodes_df.withColumn("shingles", sh)
        .withColumn("sh_hashes", shingle_hashes_col(F.col("shingles")))
        .withColumn("minhash", minhash_sig_from_hashes(F.col("sh_hashes")))
        .withColumn(
            "bands", band_keys_col(F.col("entity_type"), F.col("minhash"))
        )
        .drop("sh_hashes")
    )


def candidate_pairs(
    sig_df: DataFrame, max_band_bucket: int | None = None
) -> DataFrame:
    """Band-blocked candidate pairs (node_a < node_b), deduped.

    ``max_band_bucket``: at web scale, a handful of band keys can collect
    millions of nodes (stop-surfaces); buckets above the cap are dropped
    before the self-join (quadratic blow-up guard). None = exact (tests).
    """
    b = sig_df.select(
        # explode_outer: see dedup.candidate pairs — avoids the inferred
        # Generate filter that re-inlines the signature expression
        F.col("node_id"), F.col("shingles"), F.explode_outer("bands").alias("band")
    )
    if max_band_bucket is not None:
        sizes = b.groupBy("band").count().where(F.col("count") <= max_band_bucket)
        b = b.join(F.broadcast(sizes.select("band")), "band")
    left = b.select(
        F.col("band"),
        F.col("node_id").alias("node_a"),
        F.col("shingles").alias("shingles_a"),
    )
    right = b.select(
        F.col("band"),
        F.col("node_id").alias("node_b"),
        F.col("shingles").alias("shingles_b"),
    )
    return (
        left.join(right, "band")
        .where(F.col("node_a") < F.col("node_b"))
        .select("node_a", "node_b", "shingles_a", "shingles_b")
        .dropDuplicates(["node_a", "node_b"])
    )


def scored_candidate_pairs(
    sig_df: DataFrame,
    max_band_bucket: int | None = None,
    scorer: str = "jvm",
) -> DataFrame:
    """Band self-join → score → dedup, in that order.

    Fused form of ``candidate_pairs`` + ``score_pairs`` that scores each
    band collision INSIDE the join's codegen span and only then dedups,
    so the dropDuplicates exchange carries slim (node_a, node_b, score)
    rows instead of two shingle arrays per row (same ordering as
    ``similarity.ivf_cosine_dup_pairs`` — exchanges never carry vectors).
    Jaccard is deterministic, so scoring before dedup is value-identical
    to dedup-then-score; a pair sharing k bands computes the (cheap,
    row-local) score k times instead of shuffling its arrays once — the
    right trade at scale where the dedup exchange dominates.
    """
    from ner_spark.functions.dedup import register_persist

    # the exploded band frame feeds BOTH join sides (plus the optional
    # bucket census); without a persist each consumer re-runs the whole
    # signature pass (md5 per shingle + minhash + band keys) over the
    # node dimension — measured ~2x the band-join cost at sf0.1. Same
    # bounded-LRU registry as the dedup pair generators.
    b = register_persist(
        sig_df.select(
            F.col("node_id"), F.col("shingles"), F.explode_outer("bands").alias("band")
        )
    )
    if max_band_bucket is not None:
        sizes = b.groupBy("band").count().where(F.col("count") <= max_band_bucket)
        b = b.join(F.broadcast(sizes.select("band")), "band")
    left = b.select(
        F.col("band"),
        F.col("node_id").alias("node_a"),
        F.col("shingles").alias("shingles_a"),
    )
    right = b.select(
        F.col("band"),
        F.col("node_id").alias("node_b"),
        F.col("shingles").alias("shingles_b"),
    )
    matched = left.join(right, "band").where(F.col("node_a") < F.col("node_b"))
    if scorer == "pandas":
        score = _pandas_jaccard(F.col("shingles_a"), F.col("shingles_b"))
    else:
        score = jaccard_col(F.col("shingles_a"), F.col("shingles_b"))
    return (
        matched.select("node_a", "node_b", score.alias("score"))
        .dropDuplicates(["node_a", "node_b"])
    )


def score_pairs(pairs_df: DataFrame, scorer: str = "jvm") -> DataFrame:
    """Verification of candidate pairs — the entity-link scorer.

    Two interchangeable physical forms of the SAME score (shingle-set
    Jaccard; asserted bit-identical in tests):

    * ``jvm`` (default): pure built-ins (array_intersect/array_union)
      inside the join's codegen span — no Python, the fast path;
    * ``pandas``: an Arrow-batched pandas UDF — the extension point for
      learned scorers (an embedding-similarity or classifier scorer
      drops into the same batched signature; the north-star
      architecture's "pandas-UDF entity-link scorer" slot).

    No shuffle beyond the join that produced the pairs either way."""
    if scorer == "pandas":
        return pairs_df.withColumn(
            "score", _pandas_jaccard(F.col("shingles_a"), F.col("shingles_b"))
        ).select("node_a", "node_b", "score")
    return pairs_df.withColumn(
        "score", jaccard_col(F.col("shingles_a"), F.col("shingles_b"))
    ).select("node_a", "node_b", "score")


def link_edges(
    mentions_exploded: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_band_bucket: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """exploded mentions -> (nodes, edges). Edges connect same-type nodes
    whose normalized surfaces pass the Jaccard threshold.

    ``nodes`` is localCheckpointed: it is the small aggregated dimension
    (|nodes| ≪ |mentions|) that three consumers re-derive otherwise —
    the signature pass, the CC strategy probe, and the assignment join —
    each re-running the mention groupBy. Materializing it once is the
    in-query equivalent of what the manifest protocol does between
    pipeline stages (measured 2.4x on the link+CC slice)."""
    nodes = mention_nodes(mentions_exploded).localCheckpoint(eager=True)
    sigs = with_signatures(nodes)
    scored = scored_candidate_pairs(sigs, max_band_bucket=max_band_bucket)
    edges = scored.where(F.col("score") >= threshold)
    return nodes, edges
