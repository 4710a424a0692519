"""Dataset-hygiene operators for training-data pipelines: deterministic
train/val splitting and benchmark decontamination.

Both are standard large-corpus LLM-data operations with no reference
counterpart (the reference's split is pre-made file pairs,
/root/reference/data/train vs data/test):

* **splits** must be a pure function of the example key — stable across
  runs, partitionings, and engines — never ``rand()``: re-ingesting a
  grown corpus must keep every old example on its old side of the split
  or validation silently contaminates training. Implemented as a 60-bit
  md5 bucket of the key (the repo's cross-engine hash spec), compared
  against per-split thresholds.

* **decontamination** removes corpus documents that share long word
  n-grams with an evaluation set. The corpus side streams (explode to
  distinct n-gram hashes — linear, map-side), the benchmark side is
  small and BROADCAST, so the overlap join is shuffle-free; only the
  final per-document hit aggregation exchanges on doc id. This is the
  plan that survives 100 TB: no corpus self-join, no benchmark shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ner_spark.functions.dedup import word_shingles_col
from ner_spark.operators.linking import md5_hash60_col

SPLIT_BUCKETS = 1000


def split_bucket_col(key: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, 1000) from the example key: 60-bit
    md5 of ``salt|key`` mod 1000. Same integer in DuckDB via
    ``('0x'||substring(md5(...),1,15))::BIGINT % 1000``."""
    return F.pmod(
        md5_hash60_col(F.concat_ws("|", F.lit(salt), key.cast("string"))),
        F.lit(SPLIT_BUCKETS),
    )


def split_assign_col(key: Column, train_pct: int = 90, salt: str = "split") -> Column:
    """'train' / 'val' label: buckets below ``train_pct``% go to train.
    A pure function of the key — growing the corpus never moves an
    existing example across the split."""
    return F.when(
        split_bucket_col(key, salt) < train_pct * SPLIT_BUCKETS // 100,
        F.lit("train"),
    ).otherwise(F.lit("val"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic fixed-size sample per stratum: the ``k`` rows of
    each stratum with the lowest 60-bit md5 of ``salt|id`` (ties broken
    by id). Hash order is a uniform random order that every run and
    engine agrees on — the distributed replacement for reservoir
    sampling, with the same growth stability as the splits: a row
    already sampled stays sampled until enough lower-hash rows join its
    stratum. One hash-partition exchange on the stratum key."""
    from pyspark.sql import Window

    h = md5_hash60_col(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def ngram_hashes_col(text: Column, n: int = 8) -> Column:
    """Distinct 60-bit hashes of the text's word ``n``-grams (the whole
    text when shorter than ``n`` words) — the unit of contamination
    matching. Row-local higher-order functions, no Python."""
    return F.array_distinct(
        F.transform(word_shingles_col(text, k=n), md5_hash60_col)
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus documents sharing ≥1 word ``n``-gram with the benchmark:
    (doc_id, n_grams, n_hits, hit_ratio), one row per contaminated doc.

    The benchmark's distinct gram-hash set is broadcast, so the overlap
    check is a map-side semi-join over the corpus's exploded grams; the
    only exchange is the per-doc hit count. Callers drop (or flag) the
    returned ids before training."""
    c = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(ngram_hashes_col(F.col(text_col), n)).alias("g"),
    )
    b = F.broadcast(
        benchmark.select(
            F.explode_outer(ngram_hashes_col(F.col(text_col), n)).alias("g")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # ONE corpus pass: broadcast left join marks contaminated grams, the
    # per-doc aggregation counts totals and hits together — the n-gram
    # derivation is never evaluated twice.
    return (
        c.join(b, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hits"),
        )
        .where(F.col("n_hits") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_grams"), 6).alias("hit_ratio"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus minus contaminated documents (left-anti on the flagged
    ids)."""
    bad = contaminated_docs(corpus, benchmark, n, id_col, text_col).select(
        F.col("doc_id").alias(id_col)
    )
    return corpus.join(bad, id_col, "left_anti")


def kg_negative_samples(
    edges: DataFrame, nodes: DataFrame, k: int = 3
) -> DataFrame:
    """Deterministic filtered negative sampling for KG-embedding
    training: for every distinct canonical edge, up to ``k`` corrupted
    tails ``(src_entity, pred, dst_entity, neg_dst, j)`` where
    ``neg_dst`` is a same-type entity that does NOT form a real edge
    with (src, pred).

    Determinism (the property random samplers lack, and the reason this
    is reproducible across engines, partitionings and reruns): negative
    j of an edge is the entity at rank ``h60(src|pred|dst#j) mod
    pool_size`` in the lexicographic entity pool of the tail's type —
    the same md5-h60 the MinHash spec tri-implements. Collisions with
    the true tail and with known positives are dropped (standard
    "filtered" protocol), so an edge can yield fewer than k rows.

    Plan shape: the j-expansion and hash are row-local over the distinct
    edge set; pool sizes join as a broadcast (one row per entity type);
    the rank join keys on (type, rank) against the entity dimension
    (broadcast when it fits, AQE shuffle join at scale); the
    known-positive filter is one left-anti join keyed on the slim
    (src, pred, neg) triple. The per-type ``row_number`` that ranks the
    pool is a sort of the ENTITY dimension only (≪ turns — same cost
    class as the vocabulary build); at extreme entity cardinality the
    rank column belongs in the materialized node table (computed once
    per KG publish, not per sampling run).
    """
    from pyspark.sql import Window

    pool = nodes.select(
        F.col("entity_id"),
        F.substring_index("entity_id", "|", 1).alias("etype"),
    )
    sizes = pool.groupBy("etype").agg(F.count(F.lit(1)).alias("pool_n"))
    ranked = pool.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("etype").orderBy("entity_id")
        ).cast("long"),
    )
    e = (
        edges.select("src_entity", "pred", "dst_entity")
        .distinct()
        .withColumn("etype", F.substring_index("dst_entity", "|", 1))
        .join(F.broadcast(sizes), "etype")
        .select(
            "*", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j")
        )
    )
    h = md5_hash60_col(
        F.concat(
            F.concat_ws("|", "src_entity", "pred", "dst_entity"),
            F.lit("#"),
            F.col("j").cast("string"),
        )
    )
    cand = e.withColumn("rk", F.pmod(h, F.col("pool_n")) + F.lit(1)).join(
        ranked.withColumnRenamed("entity_id", "neg_dst"), ["etype", "rk"]
    )
    positives = edges.select(
        "src_entity", "pred", F.col("dst_entity").alias("neg_dst")
    ).distinct()
    return (
        cand.where(F.col("neg_dst") != F.col("dst_entity"))
        .join(positives, ["src_entity", "pred", "neg_dst"], "left_anti")
        .select("src_entity", "pred", "dst_entity", "neg_dst", "j")
    )


def mixture_weights(
    df: DataFrame, group_col: str = "lang", alpha: float = 0.3
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual-corpus
    balancing rule of XLM-R / mT5): sample group ``l`` with probability
    ``q_l ∝ p_l^alpha`` where ``p_l`` is the group's corpus share —
    ``alpha < 1`` upsamples tail languages/sources so the head doesn't
    drown them. Returns one row per group: ``(lang, n_docs, p_micro,
    q_micro, weight_micro)`` where ``weight_micro`` ≈ 1e6·q_l/p_l is
    the per-document sampling weight a downstream sampler broadcast-
    joins onto the corpus.

    Determinism: the one libm call (``pow``) is quantized to an int64
    immediately (1e12 grid, round-half-up) so the normalizing sum is an
    INTEGER sum — order-independent — and every later step is integer
    division or a single fixed-order IEEE expression, bit-identical
    across engines. (1e6·qint ≤ 1e18 stays inside int64.)

    Scale shape: one map-side-combinable count keyed on the group (key
    cardinality = #languages/#sources — tiny), then two broadcast cross
    joins of one-row totals. Nothing here grows with corpus size except
    the first count's input.
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = counts.agg(F.sum("n_docs").alias("n_total"))
    qint = F.floor(
        F.pow(
            F.col("n_docs").cast("double") / F.col("n_total").cast("double"),
            F.lit(float(alpha)),
        )
        * F.lit(1e12)
        + F.lit(0.5)
    ).cast("long")
    c = counts.crossJoin(F.broadcast(totals)).withColumn("qint", qint)
    qtot = c.agg(F.sum("qint").alias("q_total"))
    c = c.crossJoin(F.broadcast(qtot))
    weight = F.floor(
        F.lit(1e6)
        * (
            (F.col("qint").cast("double") / F.col("q_total").cast("double"))
            / (F.col("n_docs").cast("double") / F.col("n_total").cast("double"))
        )
        + F.lit(0.5)
    ).cast("long")
    return c.select(
        F.col("grp").alias(group_col),
        "n_docs",
        F.expr("n_docs * 1000000L div n_total").alias("p_micro"),
        F.expr("qint * 1000000L div q_total").alias("q_micro"),
        weight.alias("weight_micro"),
    )


def filter_report(
    df: DataFrame,
    min_tokens: int = 20,
    min_alpha_micro: int = 810_000,
    max_rep_micro: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-filter chain with FIRST-FAILING-RULE attribution — the
    curation audit view ("which rule is eating my corpus") that a
    kept/dropped boolean can't answer. Rules run in fixed priority
    order and the verdict is the first one that fires:

    1. ``too_short``  — fewer than ``min_tokens`` whitespace tokens;
    2. ``low_alpha``  — ascii-letter character ratio below
       ``min_alpha_micro`` (1e-6 grid);
    3. ``repetitive`` — duplicated word-3-gram fraction above
       ``max_rep_micro`` (the Gopher-style repetition signal);
    4. ``kept``.

    Returns ``(doc_id, n_tokens, alpha_micro, rep_micro, verdict)`` —
    one row per document, so the per-rule drop counts are one tiny
    groupBy away and every dropped doc is auditable by id.

    All three signals are row-local built-ins (split/regexp/shingle
    higher-order functions) composed from the same text.py/dedup.py
    columns the standalone quality queries use; ratios are quantized to
    the 1e-6 integer grid via a single IEEE division each, so the
    verdict is a pure function of the text on any engine. No exchange
    at all — the operator is a narrow map over the corpus scan.
    """
    sig = filter_signal_cols(F.col(text_col))
    verdict = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("alpha_micro") < min_alpha_micro, F.lit("low_alpha"))
        .when(F.col("rep_micro") > max_rep_micro, F.lit("repetitive"))
        .otherwise(F.lit("kept"))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        sig["n_tokens"].alias("n_tokens"),
        sig["alpha_micro"].alias("alpha_micro"),
        sig["rep_micro"].alias("rep_micro"),
    ).withColumn("verdict", verdict)


def curation_decisions(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_tokens: int = 20,
    min_alpha_micro: int = 810_000,
    max_rep_micro: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """END-TO-END curation decision per corpus document — the single
    keep/drop-with-reason table a training-data pipeline publishes,
    composing the engine's own proven operators in the order a real
    pipeline applies them (cheap-and-certain before heuristic):

    1. ``exact_dup``     — not the min-id survivor of its content-hash
       group (``content_hash``/``exact_dup_groups`` semantics);
    2. ``contaminated``  — shares a word ``n``-gram with the benchmark
       (``contaminated_docs``);
    3. ``too_short`` / ``low_alpha`` / ``repetitive`` — the
       ``filter_report`` chain, same thresholds and priority;
    4. ``kept``.

    Returns ``(doc_id, decision, keep)``.

    Plan shape: the quality signals and the content hash ride ONE
    row-local pass over the corpus scan; the survivor flag is an
    unordered window over content-hash partitions (size = duplicate
    multiplicity); contamination joins the benchmark's broadcast gram
    set map-side and its per-doc aggregate comes back keyed on doc id
    (its output ≪ corpus, so AQE turns the final left join into a
    broadcast join at this scale — a shuffle join beyond). No stage is
    quadratic; nothing collects to the driver.
    """
    from pyspark.sql import Window

    from ner_spark.functions.text import content_hash

    text = F.col(text_col)
    sig = filter_signal_cols(text)
    base = corpus.select(
        F.col(id_col).alias("doc_id"),
        content_hash(text).alias("_h"),
        sig["n_tokens"].alias("n_tokens"),
        sig["alpha_micro"].alias("alpha_micro"),
        sig["rep_micro"].alias("rep_micro"),
    ).withColumn("_keep_id", F.min("doc_id").over(Window.partitionBy("_h")))
    bad = contaminated_docs(corpus, benchmark, n, id_col, text_col).select(
        "doc_id", F.lit(True).alias("_contam")
    )
    decision = (
        F.when(F.col("doc_id") != F.col("_keep_id"), F.lit("exact_dup"))
        .when(F.col("_contam"), F.lit("contaminated"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("alpha_micro") < min_alpha_micro, F.lit("low_alpha"))
        .when(F.col("rep_micro") > max_rep_micro, F.lit("repetitive"))
        .otherwise(F.lit("kept"))
    )
    return base.join(bad, "doc_id", "left").select(
        "doc_id",
        decision.alias("decision"),
        (decision == F.lit("kept")).cast("long").alias("keep"),
    )


def filter_signal_cols(text: Column) -> dict[str, Column]:
    """The three row-local quality signals behind ``filter_report``,
    reusable by composite curation views: whitespace token count,
    ascii-letter character ratio, and duplicated word-3-gram fraction —
    the ratios on the 1e-6 integer grid (one IEEE division each)."""
    from ner_spark.functions.dedup import word_shingles_col
    from ner_spark.functions.text import tokens_col

    n_tokens = F.size(tokens_col(text))
    # empty text would put Inf/NaN through the ANSI long cast — pin it to 0
    alpha_micro = F.when(F.length(text) == 0, F.lit(0).cast("long")).otherwise(
        F.floor(
            F.lit(1e6)
            * (
                F.length(F.regexp_replace(F.lower(text), r"[^a-z]", "")).cast(
                    "double"
                )
                / F.length(text).cast("double")
            )
        ).cast("long")
    )
    total3 = F.greatest(n_tokens - F.lit(2), F.lit(1))
    rep_micro = F.floor(
        F.lit(1e6)
        * (
            F.lit(1.0)
            - F.size(word_shingles_col(text, k=3)).cast("double")
            / total3.cast("double")
        )
    ).cast("long")
    return {
        "n_tokens": n_tokens,
        "alpha_micro": alpha_micro,
        "rep_micro": rep_micro,
    }


def mention_contexts(
    mentions: DataFrame, transcripts: DataFrame, window: int = 3
) -> DataFrame:
    """Entity-linking / NER-finetune training examples: each detected
    mention with ``window`` tokens of surrounding context —
    ``(conv_id, turn_idx, mention_idx, pred, obj, mention_text,
    context)``. ``mention_text`` re-slices the turn's whitespace tokens
    at [span_start, span_end) (the extraction stage's own indexing, so
    the slice reproduces the mention surface exactly); ``context``
    widens the slice by ``window`` tokens each side, clamped at the
    turn boundaries. The context window is what an EL scorer or a
    hard-negative miner trains on — the bare surface form is ambiguous
    ("Kyoto" the place vs the org name) precisely when context
    disambiguates it.

    Plan: one (conv_id, turn_idx)-keyed join to bring in the turn text
    (transcripts prune to three columns at the scan), then row-local
    split/slice/join built-ins — no Python, no window function, no
    second shuffle. When the mentions frame already carries ``text``
    (the pipeline's extraction output does — it rides the turn row
    through the fused Python stage), the join is skipped entirely and
    the operator is pure row-local narrow work.
    """
    toks = F.split(F.col("text"), " ")
    lo = F.greatest(F.lit(0), F.col("span_start") - F.lit(window))
    m_len = (F.col("span_end") - F.col("span_start")).cast("int")
    c_len = (F.col("span_end") + F.lit(window) - lo).cast("int")
    if "text" in mentions.columns:
        joined = mentions
    else:
        joined = mentions.join(
            transcripts.select("conv_id", "turn_idx", "text"),
            ["conv_id", "turn_idx"],
        )
    return (
        joined
        .select(
            "conv_id",
            "turn_idx",
            "mention_idx",
            "pred",
            "obj",
            F.array_join(
                F.slice(toks, (F.col("span_start") + F.lit(1)).cast("int"), m_len),
                " ",
            ).alias("mention_text"),
            F.array_join(
                F.slice(toks, (lo + F.lit(1)).cast("int"), c_len), " "
            ).alias("context"),
        )
    )


def corpus_drift(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Distribution drift between two corpus snapshots, per group —
    ``(lang, old_n, new_n, l1_drift_micro)`` where ``l1_drift_micro``
    is the L1 distance between the two snapshots' token-count
    histograms (each bucket's frequency quantized to the 1e-6 grid
    BEFORE the |Δ| sum, so the statistic is an exact integer in
    [0, 2e6] regardless of corpus size — no overflow, no
    reduction-order dependence). This is the monitor a recurring
    ingest runs: "did this week's crawl change what a typical 'de'
    document looks like", the integer-grid stand-in for a KS test.

    Plan: each side is the token_percentiles histogram shape (map-side
    (group, value) counts, group total as an unordered window over the
    same partition key), the two histograms meet in ONE full-outer join
    keyed (group, value) with absent buckets as frequency 0, and the
    drift is a map-side-combinable sum per group. Nothing scales past
    the value domain after the first aggregates.
    """
    from pyspark.sql import Window

    from ner_spark.functions.text import tokens_col

    def hist(df: DataFrame, side: str) -> DataFrame:
        d = df.select(
            F.col(group_col).alias("grp"),
            F.size(tokens_col(F.col(text_col))).alias("v"),
        )
        h = d.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("c"))
        n = F.sum("c").over(Window.partitionBy("grp"))
        f = F.floor(
            F.lit(1e6) * (F.col("c").cast("double") / n.cast("double"))
            + F.lit(0.5)
        ).cast("long")
        return h.select(
            "grp", "v", f.alias(f"f_{side}"), n.alias(f"n_{side}")
        )

    o = hist(old, "old")
    w = hist(new, "new")
    j = o.join(w, ["grp", "v"], "full")
    zero = F.lit(0).cast("long")
    per_grp = j.groupBy("grp").agg(
        F.max("n_old").alias("old_n"),
        F.max("n_new").alias("new_n"),
        F.sum(
            F.abs(
                F.coalesce("f_old", zero) - F.coalesce("f_new", zero)
            )
        ).alias("l1"),
    )
    return per_grp.select(
        F.col("grp").alias(group_col),
        F.coalesce("old_n", zero).alias("old_n"),
        F.coalesce("new_n", zero).alias("new_n"),
        F.col("l1").alias("l1_drift_micro"),
    )


def mixture_resample(
    df: DataFrame,
    weights: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Materialize a temperature-balanced corpus from per-group
    sampling weights (the actionable half of ``mixture_weights``):
    every input row yields ``floor(w)`` copies plus one more with
    probability ``frac(w)`` — ``(doc_id, lang, copy_idx)``, expected
    multiplicity exactly ``weight_micro/1e6``.

    The fractional coin is NOT random: row ``i`` gets its extra copy
    iff ``h60(salt|id) mod 1e6 < weight_micro mod 1e6`` — the repo's
    cross-engine md5 hash spec, so the resampled corpus is a pure
    function of (corpus, weights): identical across runs, engines and
    partitionings, and STABLE under corpus growth the same way the
    train/val split is (an existing row's multiplicity never changes
    when new rows arrive, only when the weights table does).

    Plan: weights join as a broadcast (one row per group), the copy
    count and coin are row-local integer arithmetic, and the expansion
    is one ``explode`` of a bounded sequence — no shuffle at all; the
    output is written partition-aligned with the input scan.
    """
    w = F.broadcast(
        weights.select(
            F.col(group_col).alias("grp"), "weight_micro"
        )
    )
    joined = df.select(
        F.col(id_col).alias("doc_id"), F.col(group_col).alias("grp")
    ).join(w, "grp")
    coin = F.pmod(
        md5_hash60_col(
            F.concat_ws("|", F.lit(salt), F.col("doc_id").cast("string"))
        ),
        F.lit(1_000_000),
    )
    n_copies = F.expr("weight_micro div 1000000L") + F.when(
        coin < F.pmod(F.col("weight_micro"), F.lit(1_000_000)), 1
    ).otherwise(0)
    return (
        joined.withColumn("n_copies", n_copies)
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            F.col("grp").alias(group_col),
            F.explode(
                F.sequence(F.lit(1), F.col("n_copies").cast("int"))
            ).alias("copy_idx"),
        )
    )


def sft_pairs(transcripts: DataFrame) -> DataFrame:
    """Supervised-fine-tuning pair extraction from the transcripts —
    ``(conv_id, turn_idx, prompt, response)``: every user turn whose
    IMMEDIATELY following turn (in ``turn_idx`` order within the
    conversation) is an assistant turn becomes one training example.
    Tool turns and user→user repairs break adjacency and emit nothing —
    the conservative pairing a chat-SFT dataset builder starts from
    (multi-turn packing composes on top via ``pack_sequences``).

    Plan shape: ONE conv_id-keyed exchange feeds the lead window (the
    window partition is a conversation — bounded by dialogue length,
    the pipeline-wide invariant), and everything else is row-local.
    Deterministic by construction: adjacency is a pure function of the
    (conv_id, turn_idx) order.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.lead("role").over(w).alias("next_role"),
            F.lead("text").over(w).alias("next_text"),
        )
        .where((F.col("role") == "user") & (F.col("next_role") == "assistant"))
        .select(
            "conv_id",
            "turn_idx",
            F.col("text").alias("prompt"),
            F.col("next_text").alias("response"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 200,
    weight_col: str = "n_chars",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    quality/length-proportional corpus subsample every training-mix
    builder needs (sample k docs with inclusion odds ∝ weight).

    Efraimidis–Spirakis A-ES via the exponential race: doc i gets key
    u_i^(1/w_i) ⇔ rank by ln(u_i)/w_i descending, where u_i is the
    md5-h60 uniform of the salted doc id — a pure function of
    (corpus, salt, k), so the sample is reproducible across engines,
    partitionings and reruns, and changing ``salt`` redraws it.

    Quantization is TWO-stage so the grid stays fine at any weight:
    ln(u) — the only transcendental — is floored onto the 1e-6 grid
    first (|ln u| ≤ 41.6, so the scaled value is ≤ 4.2e7 and the
    few-ULP libm wobble is ~1e-8 of a cell: both engines floor the
    same integer).  The key then divides that exact integer by w and
    floors onto a second 1e-6 grid — division and multiplication of
    exact inputs are IEEE-correctly-rounded in every engine, so no
    further libm exposure — giving ~4.2e7/w-cell resolution *per unit
    weight* instead of the single coarse grid a one-shot
    floor(ln(u)/w·1e6) leaves for large w (at w=1e6 that grid has ~42
    cells and the doc_id tie-break would swamp the race).  Micro-cell
    ties still break on doc_id.  The top-k is TakeOrderedAndProject:
    one row-local pass, no shuffle wider than k rows, no window.  At
    100 TB this is a scan + per-partition top-k merge.
    """
    h = md5_hash60_col(
        F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string"))
    )
    u = (h + F.lit(1).cast("bigint")).cast("double") / F.lit(
        1152921504606846976.0
    )
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    lnq = F.floor(F.log(u) * F.lit(1000000.0)).cast("double")
    key = F.floor((lnq / w) * F.lit(1000000.0)).cast("long")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            w.cast("long").alias("wt"),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(k)
    )


def dsir_weights(
    docs: DataFrame,
    target_source: str = "src0",
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") — ``(doc_id, n_feats,
    logw)``: hashed-n-gram importance of each document under the target
    distribution. Features are the document's word unigrams + bigrams
    hashed into ``n_buckets`` buckets (with multiplicity — DSIR models
    bag-of-hashed-ngrams counts); the bucket distribution of the TARGET
    slice (``source == target_source``) and of the RAW rest are both
    Laplace-smoothed, and a document's log importance weight is the sum
    over its feature occurrences of log p_target(b) − log p_raw(b).
    Downstream, ``weighted_sample`` over exp(logw) IS the paper's
    importance resampling step.

    Cross-engine determinism: each bucket's log-ratio is quantized to
    an integer micro-grid (round(·×1e6) as long) BEFORE the per-doc
    sum — the same ln-before-sum device as mixture_weights — so the
    Spark and DuckDB sums are integer-exact and order-independent;
    ``logw`` is that integer divided by 1e6 (no further rounding).
    Documents with no tokens emit no row (no signal to weigh).

    Scale shape: one corpus pass explodes features (row-local md5 +
    pmod, no Python); the bucket census is ONE map-side-combinable
    groupBy whose result is ≤ ``n_buckets`` rows; totals ride a
    broadcast one-row cross join; the per-doc sum joins the exploded
    features against the broadcast ≤``n_buckets``-row lookup and
    aggregates — so the only corpus-scale exchange is the final
    per-doc combine.
    """
    from ner_spark.functions.colutil import let
    from ner_spark.functions.text import tokens_col
    from ner_spark.operators.linking import md5_hash60_col

    def grams_col(text: Column) -> Column:
        return let(
            F.filter(tokens_col(F.lower(text)), lambda x: x != ""),
            lambda toks: F.concat(
                toks,
                F.when(
                    F.size(toks) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            ),
        )

    feats = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(source_col) == target_source).alias("is_t"),
        F.explode(grams_col(F.col(text_col))).alias("gram"),
    ).select(
        "doc_id",
        "is_t",
        F.pmod(md5_hash60_col(F.col("gram")), F.lit(n_buckets)).alias("b"),
    )
    stats = feats.groupBy("b").agg(
        F.sum(F.col("is_t").cast("long")).alias("ct"),
        F.sum((~F.col("is_t")).cast("long")).alias("cr"),
    )
    tot = stats.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    lookup = stats.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("ct") + 1.0) / (F.col("tt") + float(n_buckets)))
                - F.log((F.col("cr") + 1.0) / (F.col("tr") + float(n_buckets)))
            )
            * 1e6
        )
        .cast("long")
        .alias("q"),
    )
    return (
        feats.join(F.broadcast(lookup), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            (F.sum("q") / 1e6).alias("logw"),
        )
    )
