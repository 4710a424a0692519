"""BPE merge-pair induction — tokenizer TRAINING at corpus scale.

Reference parity: the reference tokenizes with a FIXED WordPiece vocab
(/root/reference/bert_model/vocab.txt, consumed via train_bert_crf.py:13
and the vendored BERT tokenizer) — it never learns one. This operator
adds the training half of that story: learn the merge table that a
WordPiece/BPE-style subword tokenizer needs, from the corpus itself
(public algorithm: Sennrich, Haddow & Birch 2015, "Neural Machine
Translation of Rare Words with Subword Units"; standard word-histogram
formulation, as in the original subword-nmt trainer).

Spark-first shape — the ONLY corpus-scale pass is the word histogram
(one explode + one map-side-combined groupBy on `word`).  Every merge
iteration then runs over the VOCAB-sized histogram, independent of
corpus size: one adjacent-pair aggregation (map-side partial agg on
(l, r)), one 1-row TakeOrderedAndProject collect (count desc, then
lexicographic — fully deterministic), and one row-local fold rewrite.
Lineage is cut with localCheckpoint every ``checkpoint_every`` rounds
(the same device as kmeans/k-core).  At 100 TB the histogram pass
dominates and scales linearly with executors; the iterations cost the
same at any corpus size because they see only distinct words.

Merge semantics (pinned, shared bit-for-bit with the DuckDB oracle):
one merge step rewrites each word's symbol sequence with a
left-to-right NON-OVERLAPPING scan replacing adjacent (left, right)
occurrences by left||right.  Both engines implement the scan as the
SAME left fold over the symbols (accumulator = symbols joined by the
unit separator chr(31), which never occurs in corpus text): if the
accumulator's last symbol equals `left` and the incoming symbol equals
`right`, splice them; else append.  Because a merged token
left||right can never EQUAL `left` (right is non-empty), the fold is
exactly the non-overlapping scan — pinned by tests/test_bpe.py on
adversarial repeats ("aaaa" -> [aa, aa], "aaa" -> [aa, a]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MERGES_SCHEMA = StructType(
    [
        StructField("merge_rank", IntegerType(), False),
        StructField("left", StringType(), False),
        StructField("right", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)

# adjacent-pair enumeration over the symbol array (row-local, codegen)
_PAIRS_EXPR = """
CASE WHEN size(syms) < 2 THEN array() ELSE
  transform(sequence(1, size(syms) - 1),
            i -> struct(element_at(syms, i) AS l,
                        element_at(syms, i + 1) AS r)) END
"""


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def merge_fold_expr(left: str, right: str) -> str:
    """Spark SQL for one non-overlapping merge pass over ``syms``.

    Mirrors the DuckDB ``list_reduce`` fold in the oracle exactly: the
    accumulator is the rewritten symbol list joined by chr(31); a
    splice keeps everything before the last symbol (which it just
    matched as ``left``, so its character length is len(left)) and
    appends the merged token.
    """
    l_lit, r_lit = _sql_quote(left), _sql_quote(right)
    return f"""CASE WHEN size(syms) <= 1 THEN syms ELSE
  split(aggregate(slice(syms, 2, size(syms) - 1), element_at(syms, 1),
    (acc, x) -> CASE
      WHEN element_at(split(acc, chr(31)), -1) = {l_lit} AND x = {r_lit}
      THEN concat(substring(acc, 1, length(acc) - {len(left)}),
                  {l_lit}, {r_lit})
      ELSE concat(acc, chr(31), x) END), chr(31)) END"""


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount, syms) — the single corpus-scale pass.

    Single-space tokenization (the corpus-wide tokens_col convention);
    symbols start as the word's characters.  Words containing the
    U+001F unit separator are FILTERED here (mirrored verbatim in
    ``bpe_oracle_sql``): the merge fold uses chr(31) as its accumulator
    separator, so a corpus word carrying it would silently corrupt
    symbol boundaries identically in both engines — enforcing the
    invariant at ingestion is the only place the two-engine gate can
    see it.
    """
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where((F.col("word") != "") & (~F.col("word").contains("\u001f")))
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
        .withColumn("syms", F.expr("filter(split(word, ''), ch -> ch <> '')"))
    )


def _learn_driver(
    rows: list, n_merges: int, min_count: int
) -> tuple[list[tuple[int, str, str, int]], list[list[str]]]:
    """Driver-side merge loop over a collected (wcount, syms) histogram
    — bit-identical semantics to the distributed loop (same
    (-count, left, right) argmax, same non-overlapping scan, asserted
    equal in tests/test_bpe.py).  Returns (merges, final_syms) where
    ``final_syms[i]`` is row i's fully-rewritten symbol list, so a
    segmentation consumer reuses the training rewrite instead of
    replaying the merge chain."""
    from collections import Counter

    words = [[list(syms), int(c)] for c, syms in rows]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        qual = {p: c for p, c in pairs.items() if c >= min_count}
        if not qual:
            break
        (l, r), cnt = min(qual.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        for entry in words:
            syms = entry[0]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            entry[0] = out
    return merges, [entry[0] for entry in words]


def bpe_learn(
    words: DataFrame,
    n_merges: int = 24,
    min_count: int = 2,
    checkpoint_every: int = 6,
    driver_threshold: int = 100_000,
    return_state: bool = False,
) -> (
    list[tuple[int, str, str, int]]
    | tuple[list[tuple[int, str, str, int]], DataFrame]
):
    """Learn up to ``n_merges`` merge pairs from a word histogram;
    returns [(merge_rank, left, right, pair_count), ...] on the driver
    (the merge table is vocab-level metadata, like the kmeans centroid
    collect).

    ADAPTIVE, the same device as the connected-components operator's
    driver union-find: when the histogram holds ≤ ``driver_threshold``
    distinct words it is collected once and the loop runs driver-side
    (each distributed iteration costs ~0.2 s of pure job scheduling at
    small vocab — 24 rounds of that dwarf the actual work); above the
    threshold every iteration runs distributed (one map-side-combined
    pair aggregation + a 1-row TakeOrderedAndProject collect + a
    row-local fold rewrite).  Both paths share the exact
    (-count, left, right) argmax and non-overlapping-scan semantics
    and are asserted equal in tests/test_bpe.py; the corpus-scale
    histogram pass is distributed in either case.

    Stops early when no adjacent pair reaches ``min_count`` weighted
    occurrences; pair_count = the pair's weighted frequency at the
    moment it was chosen.

    With ``return_state=True`` returns ``(merges, final_words)`` where
    ``final_words`` is the histogram with its symbols fully rewritten
    through the learned chain — training already produced that state,
    so a segmentation consumer (``bpe_segments``) reuses it instead of
    replaying every merge over a fresh histogram copy (which doubles
    the rewrite work on the distributed path).
    """
    keep = ["word", "wcount", "syms"] if return_state else ["wcount", "syms"]
    words = words.select(*keep).localCheckpoint(eager=True)
    if words.count() <= driver_threshold:
        rows = words.collect()
        merges, final_syms = _learn_driver(
            [(r["wcount"], r["syms"]) for r in rows], n_merges, min_count
        )
        if not return_state:
            return merges
        final = words.sparkSession.createDataFrame(
            [
                (r["word"], int(r["wcount"]), syms)
                for r, syms in zip(rows, final_syms)
            ],
            "word string, wcount long, syms array<string>",
        )
        return merges, final
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            words.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "wcount")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wcount").alias("cnt"))
            .where(F.col("cnt") >= min_count)
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rank, l, r, cnt))
        words = words.withColumn("syms", F.expr(merge_fold_expr(l, r)))
        if rank % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return (merges, words) if return_state else merges


def bpe_train(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int = 24,
    min_count: int = 2,
    checkpoint_every: int = 6,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Merge table (merge_rank, left, right, pair_count) as a DataFrame."""
    return spark.createDataFrame(
        bpe_learn(words, n_merges, min_count, checkpoint_every, driver_threshold),
        MERGES_SCHEMA,
    )


def bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 24,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """End-to-end: corpus -> word histogram -> learned merge table."""
    return bpe_train(
        spark, word_histogram(docs, text_col), n_merges, min_count
    )


def bpe_segments(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 24,
    min_count: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 6,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Tokenizer APPLICATION: segment every distinct corpus word with
    the merges just learned from the same corpus — (word, wcount,
    pieces).  Merges apply in rank order (the standard BPE encode),
    which over the training histogram reproduces training's final
    symbol state; the DuckDB oracle re-derives BOTH the merges and the
    segmentation from its own argmax chain, so a divergence at any
    rank surfaces as a segmentation mismatch.  Training's final symbol
    state IS the segmentation, so ``bpe_learn(return_state=True)``
    hands it back directly — no second pass over the merge chain on
    either the driver or the distributed path.
    """
    _merges, seg = bpe_learn(
        word_histogram(docs, text_col),
        n_merges,
        min_count,
        checkpoint_every,
        driver_threshold,
        return_state=True,
    )
    return seg.select(
        "word", "wcount", F.array_join("syms", " ").alias("pieces")
    )


def bpe_fertility(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 24,
    min_count: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 6,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Tokenizer FERTILITY distribution: how many pieces the learned
    merges leave per word, occurrence-weighted — ``(n_pieces, n_words,
    n_occurrences, chars_per_piece_micro)``.  The diagnostic a
    tokenizer owner reads before shipping: a long tail of
    high-``n_pieces`` rows means the merge budget is too small for the
    corpus (compute cost per token explodes downstream), and
    ``chars_per_piece_micro`` (total chars / total pieces over the
    bucket's occurrences, integer-micro so both engines agree exactly)
    is the compression ratio per bucket.  Rides the SAME final symbol
    state as ``bpe_segments`` — no extra pass over the merge chain;
    the fertility aggregate is a |distinct words|-sized
    map-side-combinable groupBy on the tiny n_pieces dimension.
    """
    _merges, seg = bpe_learn(
        word_histogram(docs, text_col),
        n_merges,
        min_count,
        checkpoint_every,
        driver_threshold,
        return_state=True,
    )
    chars = F.sum(F.col("wcount") * F.length("word"))
    pieces = F.sum(F.col("wcount") * F.col("n_pieces"))
    return (
        seg.select(
            "word", "wcount", F.size("syms").cast("int").alias("n_pieces")
        )
        .groupBy("n_pieces")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("wcount").alias("n_occurrences"),
            F.floor(F.lit(1e6) * chars / pieces)
            .cast("long")
            .alias("chars_per_piece_micro"),
        )
    )


def bpe_oracle_sql(
    n_merges: int = 24,
    min_count: int = 2,
    table: str = "documents",
    segments: bool = False,
    fertility: bool = False,
) -> str:
    """Unrolled DuckDB restatement: ``n_merges`` explicit merge blocks
    (the same second-engine device as the unrolled PageRank/k-core
    oracles).  Each block recomputes pair counts, picks the argmax
    under the identical (cnt DESC, l, r) order, and rewrites the
    histogram with the identical chr(31) string fold via
    ``list_reduce`` — LEFT JOIN ON TRUE against the 0-or-1-row best
    CTE so an exhausted corpus degrades to the identity rewrite and
    emits nothing, matching the Spark early-stop.  CTEs referenced by
    the next round are MATERIALIZED so the chain stays linear.
    """
    parts = [
        f"""
    WITH w0 AS MATERIALIZED (
      SELECT word, count(*) AS wcount, string_split(word, '') AS syms
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {table})
      WHERE word <> '' AND NOT contains(word, chr(31)) GROUP BY word)"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        parts.append(
            f""",
    p{i} AS (
      SELECT l, r, sum(wcount) AS cnt FROM (
        SELECT wcount, list_extract(syms, j) AS l,
               list_extract(syms, j + 1) AS r
        FROM (SELECT wcount, syms,
                     unnest(generate_series(1, len(syms) - 1)) AS j
              FROM w{p}))
      GROUP BY l, r),
    m{i} AS MATERIALIZED (
      SELECT {i} AS merge_rank, l, r, cnt FROM p{i}
      WHERE cnt >= {min_count}
      ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
    w{i} AS MATERIALIZED (
      SELECT word, wcount,
        CASE WHEN m.l IS NULL THEN syms ELSE
          string_split(list_reduce(syms, (acc, x) ->
            CASE WHEN list_extract(string_split(acc, chr(31)), -1) = m.l
                      AND x = m.r
                 THEN substr(acc, 1, length(acc) - length(m.l)) || m.l || m.r
                 ELSE acc || chr(31) || x END), chr(31)) END AS syms
      FROM w{p} LEFT JOIN m{i} m ON TRUE)"""
        )
    if fertility:
        parts.append(
            f"""
    SELECT CAST(len(syms) AS INTEGER) AS n_pieces,
           count(*) AS n_words,
           CAST(sum(wcount) AS BIGINT) AS n_occurrences,
           CAST(floor(1000000.0 * sum(wcount * length(word))
                      / sum(wcount * len(syms))) AS BIGINT)
             AS chars_per_piece_micro
    FROM w{n_merges} GROUP BY 1"""
        )
    elif segments:
        parts.append(
            f"""
    SELECT word, CAST(wcount AS BIGINT) AS wcount,
           array_to_string(syms, ' ') AS pieces
    FROM w{n_merges}"""
        )
    else:
        union = " UNION ALL ".join(
            f"SELECT * FROM m{i}" for i in range(1, n_merges + 1)
        )
        parts.append(
            f"""
    SELECT CAST(merge_rank AS INTEGER) AS merge_rank,
           l AS "left", r AS "right", CAST(cnt AS BIGINT) AS pair_count
    FROM ({union})"""
        )
    return "".join(parts)
