"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting.

All column-level (row-local, zero shuffle, whole-stage-codegen
friendly); every function has an equivalent ANSI-SQL restatement used by
the DuckDB oracle in ``__spark_entry__.py``, so the exact arithmetic
(rounding, ratios, hash bit-widths) is part of the spec.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ner_spark.operators.linking import md5_hash60_col

# BPE-ish token pattern: letter runs, digit runs, single non-alnum marks.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# tiny per-language stopword inventories for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "es"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish subword count: regex token classes over the lowercased
    text (letter runs / digit runs / single marks)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens_col(F.lower(text))
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.size(toks)


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ascii letters."""
    return F.length(F.regexp_replace(F.lower(text), r"[^a-z]", "")) / F.length(text)


def mean_token_len(text: Column) -> Column:
    toks = tokens_col(text)
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)


def quality_score(text: Column) -> Column:
    """Composite [0, ~1] quality heuristic: length band + alpha ratio +
    stopword presence + token-length sanity. Deterministic, rounded to 6
    decimals (the rounding is part of the cross-engine spec)."""
    n = F.length(text)
    len_band = F.when((n >= 100) & (n <= 2000), 1.0).when(n >= 30, 0.5).otherwise(0.0)
    tl = mean_token_len(text)
    tl_band = F.when((tl >= 3.0) & (tl <= 10.0), 1.0).otherwise(0.3)
    score = (
        0.3 * len_band
        + 0.3 * alpha_ratio(text)
        + 0.2 * F.least(stopword_ratio(text) * F.lit(4.0), F.lit(1.0))
        + 0.2 * tl_band
    )
    # total function: empty/NULL text pins to 0.0 (alpha_ratio would
    # otherwise divide by zero under ANSI mode) — mirrored in the
    # shared SQL restatement (_QUALITY_EXPR)
    return F.when(
        F.coalesce(F.length(text), F.lit(0)) == 0, F.lit(0.0)
    ).otherwise(F.round(score, 6))


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Fraction of duplicated word ``n``-grams — the classic repetition
    filter for LLM training corpora (boilerplate, keyword stuffing, and
    decoding loops all show as a high duplicate-gram fraction):
    ``1 − distinct/total``, 0 for texts shorter than ``n`` words.
    Row-local, rounded to 6 decimals (cross-engine spec)."""
    from ner_spark.functions.dedup import word_shingles_col

    toks = tokens_col(text)
    total = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    distinct = F.size(word_shingles_col(text, k=n))
    return F.round(1.0 - distinct / total, 6)


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    # NOTE: the stopword array must be closed over, not passed as a
    # lambda default — pyspark binds a lambda variable per parameter.
    sw = F.array(*[F.lit(s) for s in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_scores(text: Column) -> Column:
    """map-free language scoring: array of (lang, hits) over the shared
    stopword inventories; hit = token membership count. The token array
    is let-bound so tokenization runs once, not once per language."""
    from ner_spark.functions.colutil import let

    return let(
        tokens_col(F.lower(text)),
        lambda toks: F.array(
            *[
                F.struct(
                    F.lit(lang).alias("lang"),
                    _stopword_hits(toks, words).alias("hits"),
                )
                for lang, words in sorted(LANG_STOPWORDS.items())
            ]
        ),
    )


def lang_id(text: Column) -> Column:
    """Predicted language = argmax stopword hits, ties broken by lang
    name ascending, 'und' (undetermined) when no stopword matches.
    Scores and max are let-bound — evaluated once each however the
    optimizer rearranges the projection."""
    from ner_spark.functions.colutil import let

    return let(
        lang_scores(text),
        lambda scores: let(
            F.array_max(F.transform(scores, lambda s: s["hits"])),
            lambda mx: F.when(
                mx > 0,
                F.array_min(
                    F.transform(
                        F.filter(scores, lambda s: s["hits"] == mx),
                        lambda s: s["lang"],
                    )
                ),
            ).otherwise(F.lit("und")),
        ),
    )


def fingerprint_minhash(text: Column, ngram: int = 4) -> Column:
    """Document fingerprint: min 60-bit hash over word ``ngram``-grams
    (winnowing-style content fingerprint; whole text when shorter)."""
    from ner_spark.functions.colutil import let

    # let-bound token array: an inlined split re-tokenizes per gram
    # index (quadratic in document length)
    grams = let(
        tokens_col(text),
        lambda toks: F.when(F.size(toks) < ngram, F.array(text)).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (ngram - 1)),
                lambda i: F.array_join(F.slice(toks, i, ngram), " "),
            )
        ),
    )
    return F.array_min(F.transform(grams, md5_hash60_col))


def content_hash(text: Column) -> Column:
    """Exact-dup key: md5 hex of the raw text."""
    return F.md5(text)


# polynomial rolling hash: base/window sized so every intermediate fits a
# signed 64-bit int in Spark, DuckDB and Python alike — char code < 2^21
# (unicode), 33^7 < 2^36, so code·33^7 < 2^57 and the 8-term sum < 2^60.
ROLL_BASE = 33
ROLL_WINDOW = 8
ROLL_MOD = (1 << 61) - 1
ROLL_POWERS = [ROLL_BASE**k % ROLL_MOD for k in range(ROLL_WINDOW)]


def fingerprint_rolling(text: Column) -> Column:
    """Winnowing-style fingerprint over a LITERAL rolling hash: the
    minimum polynomial hash of every ``ROLL_WINDOW``-char window
    (h = Σ code(cᵢ₊ⱼ)·B^(W-1-j) mod M). Texts shorter than the window
    hash as one zero-padded window. Row-local higher-order functions."""
    from ner_spark.functions.colutil import let

    def win_hash(codes: Column, i: Column) -> Column:
        return (
            F.aggregate(
                F.sequence(F.lit(0), F.lit(ROLL_WINDOW - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: acc
                + F.coalesce(F.try_element_at(codes, i + j + 1), F.lit(0))
                * F.element_at(
                    F.array(*[F.lit(p) for p in reversed(ROLL_POWERS)]), j + 1
                ),
            )
            % F.lit(ROLL_MOD)
        )

    def body(codes: Column) -> Column:
        n_windows = F.greatest(F.size(codes) - (ROLL_WINDOW - 1), F.lit(1))
        return F.array_min(
            F.transform(
                F.sequence(F.lit(0), n_windows - 1),
                lambda i: win_hash(codes, i),
            )
        )

    codes = F.transform(
        F.split(text, ""), lambda ch: F.ascii(ch).cast("long")
    )
    return let(codes, body)


# ---------------------------------------------------------------------------
# TF-IDF term scoring
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-``k`` TF-IDF terms per document.

    Spec (identical in the SQL oracle): terms are lowercased whitespace
    tokens; tf = occurrences in the doc, df = documents containing the
    term, idf = ln((N+1)/(df+1)) + 1 (smoothed, always > 0), score =
    round(tf · idf, 6); rank per doc by (score desc, term asc) — a total
    order, so output is engine- and partitioning-invariant.

    Plan shape: explode → (doc, term) count (one shuffle on the pair
    key) → term document-frequency aggregated FROM the tf frame (no
    second corpus pass) → term-keyed join → per-doc rank window
    (partitioned: bounded by the doc's distinct terms, never global).
    N arrives as a broadcast 1-row dimension, not a driver collect, so
    the whole operator is one lazy plan."""
    from pyspark.sql import DataFrame, Window

    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens_col(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.col(id_col)).agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


def ngram_topk(
    df,
    n: int = 3,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Corpus-wide top-``k`` word n-grams with occurrence and document
    frequencies — the heavy-hitter scan that surfaces boilerplate
    (navigation chrome, license headers, template sentences) for
    removal before training.

    Spec (identical in the SQL oracle): tokens are lowercased
    single-space splits (the tokens_col convention shared with TF-IDF);
    a doc with fewer than ``n`` tokens (or NULL text) contributes
    nothing; rank by (n_occurrences desc, gram asc) — a total order.

    Plan shape: the n-gram enumeration is ROW-LOCAL (sequence +
    transform + slice inside codegen, then one explode over the scan);
    the only shuffle is the gram-keyed hash aggregate, and map-side
    partial aggregation collapses each partition's duplicate grams
    before the exchange — exactly what makes a heavy-hitter count
    survive skew (the hottest gram arrives as one partial row per map
    task, not one row per occurrence). The final top-k is
    TakeOrderedAndProject (bounded by k), never a global sort of the
    gram dimension."""
    from ner_spark.functions.colutil import let

    # let-bind the token array: an inlined split would re-tokenize the
    # text once per gram index (quadratic in document length)
    grams = let(
        tokens_col(F.lower(F.col(text_col))),
        lambda toks: F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram")
    )
    counts = exploded.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    ).limit(k)


def bm25_topk(
    df,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 top-``k`` retrieval for a fixed term query over the corpus:
    ``(doc_id, score_micro)`` — the lexical-retrieval primitive of a
    RAG / training-data-curation stack ("pull the documents most about
    X"), Okapi BM25 with the standard k1/b defaults.

    Scale shape — no inverted-index shuffle at all for a bounded query:
    * per-term term frequencies and the document length are ROW-LOCAL
      higher-order expressions over the split text (|terms| is a query
      constant), so the scan stays one embarrassingly-parallel pass;
    * corpus statistics (N, Σdl, per-term document frequencies) are ONE
      map-side-combinable scalar aggregate collected as a single row —
      the same bounded driver probe as pagerank's dangling mass;
    * idf and the length normalizer fold into per-term LITERAL
      coefficients; each document's score is a fixed-order sum of
      int64-quantized per-term contributions (floor(1e6·contrib) per
      term BEFORE the sum), so scores are bit-identical across engines
      and partitionings;
    * the top-k is orderBy(score desc, doc_id) + limit —
      TakeOrderedAndProject, never a global sort.

    idf uses ln(1 + (N − df + 0.5)/(df + 0.5)) (the non-negative
    Lucene form), computed driver-side in C-libm Python so the SQL
    oracle's own ``ln`` (same libm) reproduces it bit-for-bit.
    """
    import math

    from ner_spark.functions.dedup import register_persist

    toks = F.split(F.col(text_col), " ")
    base_cols = [
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
    ]

    def _tf(term: str):
        # factory closure, NOT a default-arg lambda: a 2-parameter
        # lambda is treated as the (element, index) higher-order form
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    for i, t in enumerate(terms):
        base_cols.append(_tf(t).alias(f"tf{i}"))
    # two consumers (stats aggregate + scoring pass): ride the bounded
    # persist LRU so the tokenizing scan runs once
    base = register_persist(df.select(*base_cols))

    aggs = [F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total_dl")]
    for i in range(len(terms)):
        aggs.append(F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}"))
    st = base.agg(*aggs).collect()[0]
    n_docs = st["n"]
    if n_docs == 0:
        return base.select(
            "doc_id", F.lit(0).cast("long").alias("score_micro")
        ).where(F.lit(False))
    avgdl = st["total_dl"] / n_docs

    contribs = []
    for i in range(len(terms)):
        idf = math.log(
            1.0 + (n_docs - st[f"df{i}"] + 0.5) / (st[f"df{i}"] + 0.5)
        )
        tf = F.col(f"tf{i}").cast("double")
        # parenthesization mirrored VERBATIM in the SQL oracle — float
        # ops are IEEE-exact but order-sensitive
        contribs.append(
            F.floor(
                F.lit(1e6)
                * F.lit(idf)
                * (
                    tf
                    * F.lit(k1 + 1.0)
                    / (
                        tf
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b)
                            * (F.col("dl").cast("double") / F.lit(avgdl))
                        )
                    )
                )
            ).cast("long")
        )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    return (
        base.select("doc_id", score.alias("score_micro"))
        .where(F.col("score_micro") > 0)
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(k)
    )


def token_percentiles(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT per-group order statistics of the whitespace token count —
    ``(lang, n_docs, p50_tokens, p90_tokens, max_tokens)`` where
    ``pXX`` is the value at ascending rank ``ceil(q·n)`` (the classic
    discrete percentile; no interpolation, so the result is an actual
    observed value and identical on every engine).

    The scale story is the point: the naive exact percentile sorts each
    group inside one window partition — the per-group resurrection of
    the single-partition-window anti-pattern (a 100 TB 'en' group lands
    on ONE task). Token counts are small-domain integers, so this
    computes a per-(group, value) HISTOGRAM first (map-side-combinable
    aggregate), then cumulative-sums over the VALUE DOMAIN — the window
    partition is bounded by the number of distinct token counts (≤ max
    document length), never by corpus size — and picks the first value
    whose running count reaches the rank. Exact, two exchanges, no
    corpus-wide sort.
    """
    from pyspark.sql import Window

    d = df.select(
        F.col(group_col).alias("grp"),
        F.size(tokens_col(F.col(text_col))).alias("v"),
    )
    hist = d.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("grp").orderBy("v")
    # the group total is an UNORDERED window over the same partition key
    # as the cumsum — one exchange serves both, no totals join at all
    j = hist.select(
        "grp",
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("grp")).alias("n_docs"),
    )
    # ceil(q*n) in exact integer arithmetic: ceil(a*n/b) = (a*n + b - 1) div b
    r50 = F.expr("(n_docs + 1) div 2")
    r90 = F.expr("(9 * n_docs + 9) div 10")
    return j.groupBy("grp", "n_docs").agg(
        F.min(F.when(F.col("cum") >= r50, F.col("v"))).alias("p50_tokens"),
        F.min(F.when(F.col("cum") >= r90, F.col("v"))).alias("p90_tokens"),
        F.max("v").alias("max_tokens"),
    ).select(
        F.col("grp").alias(group_col),
        "n_docs",
        "p50_tokens",
        "p90_tokens",
        "max_tokens",
    )


def lm_topk(
    df,
    terms: list[str],
    k: int = 10,
    mu: float = 2000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Query-likelihood top-``k`` retrieval with Dirichlet smoothing —
    the language-modeling member of the lexical-retrieval trio
    (tfidf_top_terms / bm25_topk / lm_topk): ``(doc_id, score_micro)``
    where ``score = Σ_t ln((tf_t + μ·p(t|C)) / (dl + μ))`` (Zhai &
    Lafferty's Dirichlet-prior estimator), ``p(t|C)`` the add-one-
    smoothed collection unigram ``(cf_t + 1)/(total_tokens + 1)``.
    Scores are negative log-likelihoods of the query under each
    document's smoothed LM; only documents containing at least one
    query term rank (pure-smoothing matches carry no evidence).

    Scale shape mirrors bm25_topk — no inverted index for a bounded
    query: per-term tf and dl are row-local higher-order expressions
    (|terms| is a query constant); collection statistics (Σdl, per-term
    collection frequencies Σtf) are ONE scalar map-side-combinable
    aggregate collected as a single bounded row; ``μ·p(t|C)`` folds
    into per-term double LITERALS. Each per-term contribution floors
    onto the 1e-6 grid BEFORE the fixed-order sum (the libm-ln-then-
    floor contract bm25/bigram ride), so scores are bit-identical
    across engines and partitionings; top-k is orderBy+limit —
    TakeOrderedAndProject, never a global sort.
    """
    import math

    from ner_spark.functions.dedup import register_persist

    toks = F.split(F.col(text_col), " ")
    base_cols = [
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
    ]

    def _tf(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    for i, t in enumerate(terms):
        base_cols.append(_tf(t).alias(f"tf{i}"))
    base = register_persist(df.select(*base_cols))

    aggs = [F.sum("dl").alias("total_dl")]
    for i in range(len(terms)):
        aggs.append(F.sum(f"tf{i}").alias(f"cf{i}"))
    st = base.agg(*aggs).collect()[0]
    total_dl = st["total_dl"] or 0
    if total_dl == 0:
        return base.select(
            "doc_id", F.lit(0).cast("long").alias("score_micro")
        ).where(F.lit(False))

    contribs = []
    for i in range(len(terms)):
        # parenthesization mirrored VERBATIM in the SQL oracle
        mu_pc = mu * ((st[f"cf{i}"] + 1) / (total_dl + 1))
        contribs.append(
            F.floor(
                F.lit(1e6)
                * F.log(
                    (F.col(f"tf{i}").cast("double") + F.lit(mu_pc))
                    / (F.col("dl").cast("double") + F.lit(mu))
                )
            ).cast("long")
        )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    any_match = F.greatest(
        *[F.col(f"tf{i}") for i in range(len(terms))]
    ) > 0 if len(terms) > 1 else F.col("tf0") > 0
    return (
        base.where(any_match)
        .select("doc_id", score.alias("score_micro"))
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, Appendix A —
# public MassiveText filtering heuristics), scaled to the synthetic
# corpus band. Each rule is an independent boolean so a curation report
# can attribute rejections per-rule; pass_gopher is their conjunction.
# --------------------------------------------------------------------------

GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 80
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MIN_UNIQUE_FRAC = 0.55
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8


def words_col(text: Column) -> Column:
    """Whitespace words with empty tokens dropped (documents may carry
    trailing spaces; a bare ``split`` would count phantom words)."""
    return F.filter(F.split(text, " "), lambda t: t != F.lit(""))


def gopher_rules_cols(text: Column) -> dict[str, Column]:
    """Per-rule booleans of the Gopher quality filter over one
    document. Row-local, codegen-friendly; every ratio is a single
    IEEE division of two integers, so the comparisons are bit-identical
    across engines (the SQL restatement mirrors each expression)."""
    w = words_col(text)
    n = F.size(w)
    total_len = F.aggregate(w, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    mean_wlen = total_len / n
    uniq_frac = F.size(F.array_distinct(w)) / n
    sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    sw_hits = F.size(
        F.filter(
            F.transform(w, lambda t: F.lower(t)),
            lambda t: F.array_contains(sw, t),
        )
    )
    alpha_word_frac = (
        F.size(F.filter(w, lambda t: t.rlike("[A-Za-z]"))) / n
    )
    def _guard(rule: Column) -> Column:
        # total function: zero-word docs fail every rule as FALSE (not
        # NULL) — the SQL restatement short-circuits the same way, so
        # the ratio divisions never evaluate at n = 0
        return F.when(n > 0, rule).otherwise(F.lit(False))

    rules = {
        "n_words": n.cast("int"),
        "r_word_count": _guard((n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)),
        "r_mean_word_len": _guard(
            (mean_wlen >= GOPHER_MIN_MEAN_WLEN)
            & (mean_wlen <= GOPHER_MAX_MEAN_WLEN)
        ),
        "r_unique_frac": _guard(uniq_frac >= GOPHER_MIN_UNIQUE_FRAC),
        "r_stopwords": _guard(sw_hits >= GOPHER_MIN_STOPWORD_HITS),
        "r_alpha_words": _guard(alpha_word_frac >= GOPHER_MIN_ALPHA_WORD_FRAC),
    }
    rules["pass_gopher"] = (
        rules["r_word_count"]
        & rules["r_mean_word_len"]
        & rules["r_unique_frac"]
        & rules["r_stopwords"]
        & rules["r_alpha_words"]
    )
    return rules


# --------------------------------------------------------------------------
# Text normalization (release-scrub cleanup): strip zero-width code
# points, rewrite control characters to spaces, collapse whitespace
# runs, trim. The fixture corpus is already clean, so the query surface
# injects deterministic noise first (same device as functions/pii.py's
# pii_inject_col) — the operator's effect is then checkable end-to-end.
# Character classes are written as LITERAL characters (not escape
# sequences) so the Java-regex and RE2 restatements cannot drift.
# --------------------------------------------------------------------------

ZERO_WIDTH_CHARS = "​‌‍﻿"
CONTROL_CHARS = "\x07\x1f\t"  # the injected inventory; class below is wider

_ZW_CLASS = "[" + ZERO_WIDTH_CHARS + "]"
# every C0 control + DEL, except \n (document structure) — literal range
_CTRL_CLASS = "[\x00-\x09\x0b-\x1f\x7f]"


def normalize_inject_col(text: Column, doc_id: Column) -> Column:
    """Deterministic noise: even ids get a leading BEL + double space,
    ids % 3 == 0 get a trailing tab/unit-separator run, ids % 5 == 0 a
    leading zero-width space."""
    pre = F.concat(
        F.when(doc_id % 2 == 0, F.lit("\x07  ")).otherwise(F.lit("")),
        F.when(doc_id % 5 == 0, F.lit("​")).otherwise(F.lit("")),
    )
    suf = F.when(doc_id % 3 == 0, F.lit(" \t\x1f ")).otherwise(F.lit(""))
    return F.concat(pre, text, suf)


def normalize_text_col(text: Column) -> Column:
    """Zero-width strip -> control-to-space -> space-run collapse ->
    trim. Pure regexp_replace chain: row-local, no Python, no shuffle."""
    t = F.regexp_replace(text, _ZW_CLASS, "")
    t = F.regexp_replace(t, _CTRL_CLASS, " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def rank_agreement(
    df,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Kendall-tau agreement between the BM25 and Dirichlet-QL top-k
    rankings for the same query — the retrieval-diagnostic overlay of
    the lexical trio: low tau on a query class says the two scorers
    disagree about what the corpus is "about" and the RRF fusion is
    doing real work; tau ~ 1 says one arm is redundant. One summary
    row ``(n_common, concordant, discordant, tau)`` over the documents
    BOTH arms retrieve; tau = (C - D) / (C + D) (tau-a — row_number
    ranks cannot tie), NULL when fewer than 2 common docs (try_divide,
    mirrored by the oracle's x/0).

    Scale shape: both arms end in TakeOrderedAndProject, so the
    overlay never sees more than 2k rows — the rank join, the k²-pair
    self-join and the fold all ride one tiny task; the corpus-sized
    work is exactly the two production scorers.
    """
    b = bm25_topk(df, terms, k=k, id_col=id_col, text_col=text_col)
    l = lm_topk(df, terms, k=k, id_col=id_col, text_col=text_col)
    wb = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    rb = b.select("doc_id", F.row_number().over(wb).alias("ra"))
    rl = l.select("doc_id", F.row_number().over(wb).alias("rb"))
    j = rb.join(rl, "doc_id")
    x = j.select(
        F.col("doc_id").alias("d1"), F.col("ra").alias("a1"), F.col("rb").alias("b1")
    )
    y = j.select(
        F.col("doc_id").alias("d2"), F.col("ra").alias("a2"), F.col("rb").alias("b2")
    )
    pairs = x.join(y, F.col("d1") < F.col("d2"))
    sgn = (F.col("a1") - F.col("a2")) * (F.col("b1") - F.col("b2"))
    folded = pairs.agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).alias("discordant"),
    )
    # 1-row x 1-row crossJoin (the repo's scalar-stats device) — no
    # driver-side count action inside the operator
    counts = j.agg(F.count(F.lit(1)).alias("n_common"))
    return counts.crossJoin(folded).select(
        F.col("n_common").cast("long").alias("n_common"),
        F.coalesce("concordant", F.lit(0)).alias("concordant"),
        F.coalesce("discordant", F.lit(0)).alias("discordant"),
        F.round(
            F.try_divide(
                (F.coalesce("concordant", F.lit(0)) - F.coalesce("discordant", F.lit(0))).cast("double"),
                (F.coalesce("concordant", F.lit(0)) + F.coalesce("discordant", F.lit(0))).cast("double"),
            ),
            6,
        ).alias("tau"),
    )


RAKE_STOPWORDS = (
    "a", "an", "the", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "by", "at", "it", "this", "that",
)


def rake_keyphrases(
    docs: DataFrame,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    max_phrase_len: int = 4,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010), integer-exact:
    candidate phrases are maximal stopword-free token runs (capped at
    ``max_phrase_len``), each scored by the sum of its words'
    degree/frequency ratios — ``(phrase, n_occurrences, score_micro)``,
    top-``k`` by (score, phrase). The corpus-level keyphrase census a
    curation pipeline reads next to tfidf_terms: RAKE rewards words
    that appear in LONG phrases (degree counts co-members), so it
    surfaces multiword domain terms single-word tf-idf misses.

    Determinism: the per-word ratio is quantized to integer micros
    BEFORE the per-phrase sum (``floor(1e6·degree/freq)`` — one IEEE
    multiply + divide, identical on both engines), so phrase scores
    are exact integer sums in any order; ranking ties break on the
    phrase string.

    Scale shape: tokenization and run-splitting are row-local (the
    run id is a per-doc cumulative stopword count — a window bounded
    by document length, riding one doc-keyed exchange); word stats are
    ONE map-side-combinable vocabulary-sized aggregate; the phrase
    re-aggregation keys on the phrase string; the final top-k is a
    TakeOrderedAndProject, never a global sort.
    """
    stop = F.array(*[F.lit(s) for s in stopwords])
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias(
            "pos", "word"
        ),
    ).where(F.col("word") != "")
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = toks.withColumn(
        "run_id",
        F.sum(
            F.when(F.array_contains(stop, F.col("word")), 1).otherwise(0)
        ).over(w_doc),
    ).where(~F.array_contains(stop, F.col("word")))
    w_run = Window.partitionBy("doc_id", "run_id")
    members = marked.withColumn("plen", F.count(F.lit(1)).over(w_run)).where(
        F.col("plen") <= max_phrase_len
    )
    wordstats = members.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("degree"),
    )
    scored = members.join(wordstats, "word").groupBy(
        "doc_id", "run_id"
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("phrase"),
        F.sum(
            F.floor(
                F.lit(1e6) * F.col("degree").cast("double") / F.col("freq")
            ).cast("long")
        ).alias("score_micro"),
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("score_micro").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc("phrase"))
        .limit(k)
    )
