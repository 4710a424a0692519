"""Sequence packing: concat-and-chunk training windows over a corpus.

Pretraining consumes fixed-size token windows, not documents: the corpus
is laid out as one long token stream in a deterministic document order
and sliced into ``budget``-token packs, documents straddling pack
boundaries split at token granularity (the GPT-style concat-and-chunk
layout; the reference's own batcher pads per batch instead —
/root/reference/utils.py:83-114 — which wastes pad tokens at scale).

The operator is one global EXCLUSIVE PREFIX SUM over token counts plus
row-local arithmetic. A naive prefix sum —
``sum().over(Window.orderBy(id))`` — moves the whole corpus through ONE
partition (the same anti-pattern the events_top_users round-2 fix
removed), so the sum is computed scale-safely in two levels:

1. docs bucket by ``floor(doc_id / bucket_size)``; per-bucket token
   totals aggregate in parallel (tiny result: one row per bucket);
2. bucket-level offsets take a window over the BUCKET dimension (rows =
   |corpus| / bucket_size — at 10^10 docs and the default 4096 that is
   ~2.4 M slim (long, long) rows in one task, a bounded driver-scale
   sort; raise ``bucket_size`` to shrink it further);
3. each doc's offset = its bucket's offset + a within-bucket running
   sum (window PARTITIONED by bucket — bounded by bucket_size rows).

The pack assignment is then row-local: a doc spanning stream positions
[off, off+n) intersects packs floor(off/B) … floor((off+n-1)/B), one
output row per intersection with the doc-local token slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ner_spark.functions.text import token_count_ws, tokens_col


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 4096,
) -> DataFrame:
    """(doc_id, pack_id, tok_start, tok_end) pack slices.

    ``tok_start``/``tok_end`` are the doc-local whitespace-token slice
    [start, end) contributed to ``pack_id``; every pack except the last
    holds exactly ``budget`` tokens. Deterministic: the stream order is
    ``id_col`` ascending, token counts are the engine's whitespace spec
    (``token_count_ws``; null text counts as empty ⇒ 1 token, exactly
    like the split semantics everywhere else). Pure integer arithmetic —
    bit-identical across engines and partitionings."""
    t = df.select(
        F.col(id_col).alias("doc_id"),
        token_count_ws(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias("n"),
    ).withColumn("bucket", F.floor(F.col("doc_id") / bucket_size))

    btot = t.groupBy("bucket").agg(F.sum("n").alias("btok"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    boff = btot.select(
        "bucket", (F.sum("btok").over(wb) - F.col("btok")).alias("boff")
    )
    wd = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    t = (
        t.join(F.broadcast(boff), "bucket")
        .withColumn("off", F.col("boff") + F.sum("n").over(wd) - F.col("n"))
        .drop("bucket", "boff", "btok")
    )
    b = F.lit(budget).cast("long")
    first_pack = F.floor(F.col("off") / b)
    last_pack = F.floor((F.col("off") + F.col("n") - 1) / b)
    return (
        t.select(
            "doc_id",
            "off",
            "n",
            # explode_outer although never empty (n >= 1 so last >= first):
            # non-outer Generate makes the optimizer infer a size()>0
            # filter that can drag the generator expression below
            # upstream exchanges (see dedup/linking)
            F.explode_outer(F.sequence(first_pack, last_pack)).alias("pack_id"),
        )
        .select(
            "doc_id",
            "pack_id",
            F.greatest(F.col("pack_id") * b - F.col("off"), F.lit(0).cast("long")).alias(
                "tok_start"
            ),
            F.least((F.col("pack_id") + 1) * b - F.col("off"), F.col("n")).alias(
                "tok_end"
            ),
        )
    )


def pack_sft_examples(
    transcripts: DataFrame,
    budget: int = 128,
    bucket_shift: int = 45,
) -> DataFrame:
    """Packed multi-turn SFT training examples with role-based loss
    masks — the artifact a fine-tuning job actually consumes:
    ``sft_pairs`` composed with the concat-and-chunk layout of
    ``pack_sequences``. Output ``(pack_id, conv_id, turn_idx,
    tok_start, tok_end, n_loss, pack_text)``: each row is one
    example's whitespace-token slice [tok_start, tok_end) inside
    ``pack_id`` (every pack except the last holds exactly ``budget``
    tokens), ``pack_text`` is that slice of the example's
    prompt-then-response token stream, and ``n_loss`` is how many of
    the slice's tokens are RESPONSE tokens — the positions a trainer
    unmasks (prompt tokens never take loss; an example's loss region
    is its tokens at positions >= its prompt length).

    Stream order is a deterministic SHUFFLE — examples are laid out by
    ``h60(conv_id # turn_idx)`` ascending (ties by (conv_id,
    turn_idx)) — because adjacent-in-conversation examples packed
    adjacently correlate gradients; the hash order is reproducible
    across engines, partitionings and reruns, unlike an RNG shuffle.

    Scale shape: the global exclusive prefix sum reuses the two-level
    bucket device of ``pack_sequences``, with the bucket taken from
    the TOP bits of the same hash (``key >> bucket_shift``: bucket
    order IS key-prefix order, so the two-level sum equals the global
    (key, conv_id, turn_idx)-ordered sum; 60-bit uniform key => 2^15
    equal buckets at the default shift). One conv-keyed exchange for
    the adjacency window (bounded by dialogue length), one
    bucket-keyed exchange for the offsets, row-local slicing —
    nothing scales with the corpus in any single buffer.
    """
    from ner_spark.functions.datasets import sft_pairs
    from ner_spark.operators.linking import md5_hash60_col

    ex = sft_pairs(transcripts).select(
        "conv_id",
        "turn_idx",
        tokens_col(F.coalesce(F.col("prompt"), F.lit(""))).alias("pt"),
        tokens_col(F.coalesce(F.col("response"), F.lit(""))).alias("rt"),
        md5_hash60_col(
            F.concat_ws("#", F.col("conv_id"), F.col("turn_idx").cast("string"))
        ).alias("key"),
    )
    t = ex.select(
        "conv_id",
        "turn_idx",
        "key",
        F.concat("pt", "rt").alias("toks"),
        F.size("pt").cast("long").alias("n_prompt"),
        (F.size("pt") + F.size("rt")).cast("long").alias("n"),
    ).withColumn("bucket", F.shiftright("key", bucket_shift))
    btot = t.groupBy("bucket").agg(F.sum("n").alias("btok"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    boff = btot.select(
        "bucket", (F.sum("btok").over(wb) - F.col("btok")).alias("boff")
    )
    wd = Window.partitionBy("bucket").orderBy(
        "key", "conv_id", "turn_idx"
    ).rowsBetween(Window.unboundedPreceding, 0)
    t = (
        t.join(F.broadcast(boff), "bucket")
        .withColumn("off", F.col("boff") + F.sum("n").over(wd) - F.col("n"))
        .drop("bucket", "boff", "key")
    )
    b = F.lit(budget).cast("long")
    first_pack = F.floor(F.col("off") / b)
    last_pack = F.floor((F.col("off") + F.col("n") - 1) / b)
    sliced = t.select(
        "conv_id",
        "turn_idx",
        "toks",
        "n_prompt",
        "n",
        "off",
        # explode_outer: see pack_sequences — keeps the optimizer from
        # dragging the generator below the offset exchange
        F.explode_outer(F.sequence(first_pack, last_pack)).alias("pack_id"),
    ).select(
        "conv_id",
        "turn_idx",
        "toks",
        "n_prompt",
        "pack_id",
        F.greatest(
            F.col("pack_id") * b - F.col("off"), F.lit(0).cast("long")
        ).alias("tok_start"),
        F.least((F.col("pack_id") + 1) * b - F.col("off"), F.col("n")).alias(
            "tok_end"
        ),
    )
    return sliced.select(
        "pack_id",
        "conv_id",
        "turn_idx",
        "tok_start",
        "tok_end",
        F.greatest(
            F.col("tok_end") - F.greatest(F.col("tok_start"), F.col("n_prompt")),
            F.lit(0).cast("long"),
        ).alias("n_loss"),
        F.concat_ws(
            " ",
            F.slice(
                "toks",
                (F.col("tok_start") + 1).cast("int"),
                (F.col("tok_end") - F.col("tok_start")).cast("int"),
            ),
        ).alias("pack_text"),
    )


def chunk_windows(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document overlapping retrieval chunks — ``(doc_id,
    chunk_idx, n_tokens, chunk_text)``: the RAG-ingest counterpart of
    ``pack_sequences``.  Packing lays the corpus out as ONE global
    stream (documents split at pack boundaries); chunking is strictly
    document-local — window ``i`` covers tokens ``[i*stride,
    i*stride+size)`` of the lowercased whitespace stream, windows
    overlap by ``size - stride`` tokens so no retrieval span straddles
    a hard cut, and the last window is the truncated remainder.

    Pinned degenerate semantics: a document with 1..size tokens emits
    exactly one full-coverage chunk; NULL/empty text emits NO rows
    (there is nothing to retrieve).  Start count = 1 + ceil(max(n -
    size, 0) / stride) — every token is covered and no start lies
    beyond the last token.

    Scale shape: pure row-local higher-order functions (tokenize,
    ``sequence`` over starts, ``slice`` + re-join) — the plan is a
    scan + generate with NO exchange at all; fan-out per row is
    ~n/stride output rows, each bounded by ``size`` tokens. At 100 TB
    this is the ideal operator: embarrassingly parallel, pruned to the
    two input columns.
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    toks = F.filter(
        F.when(
            F.col(text_col).isNotNull(), tokens_col(F.lower(F.col(text_col)))
        ).otherwise(F.array().cast("array<string>")),
        lambda x: x != "",
    )
    n = F.size(toks)
    n_starts = F.lit(1) + F.ceil(
        F.greatest(n - size, F.lit(0)).cast("double") / stride
    ).cast("int")
    # sequence() infers a NEGATIVE step when start > stop, so the empty
    # case must be guarded explicitly, not left to an empty range
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_starts - 1),
            lambda i: F.slice(toks, i * stride + 1, size),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_idx", "ctoks"),
    )
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("ctoks").cast("long").alias("n_tokens"),
        F.concat_ws(" ", "ctoks").alias("chunk_text"),
    )


def curriculum_schedule(
    df: DataFrame,
    budget: int = 2000,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 4096,
) -> DataFrame:
    """Quality-ordered curriculum epochs under a token budget —
    ``(doc_id, quality_micro, n_tokens, epoch, epoch_off)``: documents
    stream best-first (``quality_score`` descending, doc_id ascending
    as the tie-break) and each document lands WHOLE in the epoch where
    its stream offset falls (``epoch = floor(off / budget)``,
    ``epoch_off`` = its token offset inside that epoch). This is the
    curriculum-learning data layout ("train on the cleanest slice
    first, widen later") and, read per-epoch, the quality-tiered
    sampling table a mixture scheduler draws from.

    Same scale-safe two-level exclusive prefix sum as
    ``pack_sequences``, but riding a COMPUTED sort key: level-1 buckets
    are ``(quality_micro, floor(doc_id / bucket_size))`` — within a
    bucket the stream order IS doc_id, so the per-bucket window stays
    bounded by ``bucket_size`` rows, while the bucket-level offset
    window orders the slim per-bucket totals by (quality DESC, bucket
    ASC). No corpus-sized single-partition window anywhere; quality
    ties of any size stay parallel because the doc-id sub-bucket splits
    them. ``quality_micro = floor(1e6·quality + 0.5)`` on the already
    6-decimal-rounded score — integer on both engines, so ordering,
    epoch boundaries, and offsets are bit-identical.
    """
    from ner_spark.functions.text import quality_score

    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.floor(
            quality_score(F.col(text_col)) * F.lit(1e6) + F.lit(0.5)
        ).cast("long").alias("qm"),
        token_count_ws(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long")
        .alias("n"),
    ).withColumn("bucket", F.floor(F.col("doc_id") / bucket_size))

    btot = t.groupBy("qm", "bucket").agg(F.sum("n").alias("btok"))
    wb = Window.orderBy(F.desc("qm"), F.asc("bucket")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    boff = btot.select(
        "qm", "bucket", (F.sum("btok").over(wb) - F.col("btok")).alias("boff")
    )
    wd = Window.partitionBy("qm", "bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    t = t.join(F.broadcast(boff), ["qm", "bucket"]).withColumn(
        "off", F.col("boff") + F.sum("n").over(wd) - F.col("n")
    )
    b = F.lit(budget).cast("long")
    return t.select(
        "doc_id",
        F.col("qm").alias("quality_micro"),
        F.col("n").alias("n_tokens"),
        F.floor(F.col("off") / b).alias("epoch"),
        (F.col("off") - F.floor(F.col("off") / b) * b).alias("epoch_off"),
    )
