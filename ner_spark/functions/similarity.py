"""Similarity search over an embedding column (`array<float>`).

Baseline: brute-force cosine top-k (exact; the correctness oracle).
Scale path: bucketed LSH (coordinate-sign hyperplane signature) that
turns the all-pairs join into a per-bucket join — the IVF-style recall/
cost trade documented per function.

Cosines are computed with JVM-side higher-order functions
(``zip_with`` + ``aggregate`` in double precision, sequential array
order) and ROUNDED to 6 decimals before any ranking or thresholding —
the rounding is part of the spec so the DuckDB oracle (list_cosine_
similarity) agrees bit-for-bit on comparisons and ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_col(a: Column, b: Column, decimals: int = 6) -> Column:
    return F.round(dot_col(a, b) / (norm_col(a) * norm_col(b)), decimals)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared top-k tail: deterministic rank (cosine desc, neighbor asc —
    a total order, so results are engine/partitioning-invariant) applied
    identically by the exact and both approximate search paths."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Cost model: |queries| × |corpus| cosines — the right plan when
    |queries| is small (the queries side is broadcast, corpus streamed);
    for query sets at corpus scale use ``lsh_topk``. Ranking ties break
    on neighbor id ascending (total order ⇒ engine-independent)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("qv"), F.col("cv")))
    )
    return _rank_topk(scored, k)


def sign_bucket_col(vec: Column, n_planes: int = 8) -> Column:
    """LSH bucket id from the signs of the first ``n_planes`` coordinates
    (axis-aligned hyperplanes — deterministic and engine-portable; a
    random-rotation variant plugs in by pre-multiplying the vectors)."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda i: F.when(
                F.element_at(vec, i + 1) >= 0, F.pow(F.lit(2.0), i).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket. Per-bucket join ⇒ cost |bucket|·|queries-in-bucket| instead
    of |corpus|·|queries|; recall depends on bucket granularity
    (n_planes) — report it against ``brute_force_topk`` in benchmarks."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket", sign_bucket_col(F.col("qv"), n_planes))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", sign_bucket_col(F.col("cv"), n_planes))
    scored = (
        c.join(q, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("qv"), F.col("cv")))
    )
    return _rank_topk(scored, k)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: corpus partitioned into ``n_cells``
    Voronoi cells around deterministic seed centroids (the first
    ``n_cells`` vectors by id — at production scale the centroids come
    from a k-means job and only this seeding changes); each query probes
    its own nearest cell only (nprobe=1).

    Cost: one broadcast pass to assign cells (|corpus|·n_cells cosines,
    embarrassingly parallel) + a per-cell equi-join — the classic IVF
    trade vs brute force's |corpus|·|queries|. Assignment ties break on
    lowest cell id over the ROUNDED cosine, making cells identical
    across engines and partitionings."""
    cent = F.broadcast(
        emb.where(F.col(id_col) < n_cells).select(
            F.col(id_col).cast("long").alias("cell"),
            F.col(vec_col).alias("cvec"),
        )
    )

    def assign(df: DataFrame, idname: str, vecname: str) -> DataFrame:
        scored = df.crossJoin(cent).withColumn(
            "ccos", cosine_col(F.col(vecname), F.col("cvec"))
        )
        w = Window.partitionBy(idname).orderBy(
            F.col("ccos").desc(), F.col("cell").asc()
        )
        return (
            scored.withColumn("crk", F.row_number().over(w))
            .where(F.col("crk") == 1)
            .select(idname, vecname, "cell")
        )

    c = assign(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "neighbor_id",
        "cv",
    )
    q = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id",
        "qv",
    )
    scored = (
        c.join(q, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("qv"), F.col("cv")))
    )
    return _rank_topk(scored, k)


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key (an
    IVF cell / cluster label). Exact within block."""
    t = emb.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
    )
    a = t.select("block", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = t.select("block", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        a.join(b, "block")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_col(F.col("v_a"), F.col("v_b")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
