"""Content-based topic segmentation of multi-turn conversations.

Time-gap sessionization (entry query ``sessionize``) cuts on silence;
this module cuts on CONTENT: a new segment starts where a turn's
lexical overlap with the previous turn drops below a threshold — the
classic lexical-cohesion (TextTiling-style) boundary signal. Segments
are the retrieval/windowing unit a transcript-RAG or summarization
pipeline wants ("this stretch of the conversation is about the
return policy; the next about shipping").

Determinism: overlap is the Jaccard of the two turns' DISTINCT
lowercase token sets, integer-scaled as ``floor(1e6·|∩|/|∪|)`` — set
sizes are exact integers and the single IEEE division + floor is
bit-identical across engines, so the boundary decision (and therefore
every segment id) is a pure function of the transcript.

Scale shape: token sets are row-local; the lag and the running
boundary sum ride ONE window partitioned by ``conv_id`` and ordered by
``turn_idx`` — partitions are bounded by conversation length (the same
bound the tagging pipeline already relies on for stable turn order),
never a global window. One exchange, keyed on conv_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topic_segments(
    transcripts: DataFrame, threshold_micro: int = 150_000
) -> DataFrame:
    """Assign ``(conv_id, turn_idx, jaccard_micro, segment_id)`` to
    every turn: ``segment_id`` is 0-based within the conversation and
    increments whenever the integer-scaled Jaccard between the turn's
    and the previous turn's distinct lowercase token sets falls below
    ``threshold_micro`` (first turn of a conversation always opens
    segment 0; its ``jaccard_micro`` is reported as -1 = undefined)."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit("")
        )
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select("conv_id", "turn_idx", toks.alias("toks"))
    t = t.withColumn("prev", F.lag("toks").over(w))
    inter = F.size(F.array_intersect("toks", "prev"))
    union = F.size(F.array_union("toks", "prev"))
    jac = F.when(
        F.col("prev").isNull(), F.lit(-1).cast("long")
    ).otherwise(
        F.when(union == 0, F.lit(0).cast("long")).otherwise(
            F.floor(
                F.lit(1e6) * (inter.cast("double") / union.cast("double"))
            ).cast("long")
        )
    )
    t = t.withColumn("jaccard_micro", jac)
    boundary = (
        (F.col("jaccard_micro") >= 0)
        & (F.col("jaccard_micro") < threshold_micro)
    ).cast("long")
    return t.select(
        "conv_id",
        "turn_idx",
        "jaccard_micro",
        F.sum(boundary).over(w).alias("segment_id"),
    )


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """Tool-call transition matrix of agent transcripts:
    ``(from_tool, to_tool, n_transitions, n_convs)`` — for every
    conversation, tool-role turns in turn order yield (previous tool →
    tool) pairs, with ``<start>`` marking a conversation's first tool
    call. This is the agent-behavior funnel ("search → db_query →
    calculator", retry loops as self-transitions) an agent-ops
    dashboard or a tool-policy training set is built from.

    One conv-partitioned lag window over the tool-role subset (bounded
    by conversation length) + one map-side-combinable aggregate whose
    key cardinality is |tools|² — tiny at any corpus scale.
    """
    tools = transcripts.where(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        tools.withColumn(
            "from_tool", F.coalesce(F.lag("tool").over(w), F.lit("<start>"))
        )
        .groupBy("from_tool", F.col("tool").alias("to_tool"))
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
    )


def turn_latency(transcripts: DataFrame) -> DataFrame:
    """Per-(conversation, role) response-latency profile —
    ``(conv_id, role, n_responses, max_gap_ms, mean_gap_ms)`` where a
    turn's gap is the epoch-millisecond delta to the PREVIOUS turn of
    the conversation (any role) and the row aggregates the gaps of the
    turns the role produced. This is the agent-ops timing view
    (assistant think time, tool round-trip, user idle) that
    ``kg_turn_stats``'s coarse first/last span can't resolve.

    Everything stays on the integer millisecond grid: the mean is
    int64 floor division (``sum div count``), so the result is exact
    on any engine, partitioning, or parallelism. One conv-partitioned
    lag window (bounded by conversation length) + one
    map-side-combinable aggregate keyed on (conv_id, role).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # the fixture ts is TIMESTAMP_NTZ; unix_millis needs an LTZ input —
    # callers pin the session timezone to UTC (entry query does) so the
    # cast is a pure reinterpretation
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    gaps = t.withColumn("gap", F.col("ms") - F.lag("ms").over(w)).where(
        F.col("gap").isNotNull()
    )
    return gaps.groupBy("conv_id", "role").agg(
        F.count(F.lit(1)).alias("n_responses"),
        F.max("gap").alias("max_gap_ms"),
        F.expr("sum(gap) div count(1)").alias("mean_gap_ms"),
    )


def conv_cards(transcripts: DataFrame, triples: DataFrame) -> DataFrame:
    """Per-conversation profile card — the "conversation page" a
    transcript browser, labeling UI, or sampling dashboard reads (the
    conversation-granularity sibling of ``entity_cards``): turn volume
    by role, tool usage, wall-clock span, and what the KG extracted
    from it. One row per conversation:

    ``(conv_id, n_turns, n_user_turns, n_assistant_turns, n_tool_calls,
    duration_ms, tools, n_triples, top_pred)`` — ``tools`` is the
    sorted distinct tool list serialized ``","``-joined (array cells
    don't survive the driver's canonicalizer), ``top_pred`` is the
    conversation's most frequent extracted predicate with ties broken
    to the lexicographically LAST (max struct — deterministic under any
    partitioning), empty string when nothing was extracted.

    Scale shape: two map-side-combinable aggregates keyed on conv_id
    (transcripts and triples never join row-to-row — only their
    per-conversation summaries meet, an entity-dimension-sized join)
    plus a (conv_id, pred)-keyed count whose arg-max folds into a
    struct max, never a window sort. Tool-list buffers are bounded by
    the tool vocabulary, not by conversation length.
    """
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    base = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user_turns"),
        F.sum((F.col("role") == "assistant").cast("long")).alias(
            "n_assistant_turns"
        ),
        F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_calls"),
        (F.max(ms) - F.min(ms)).alias("duration_ms"),
        F.concat_ws(",", F.array_sort(F.collect_set("tool"))).alias("tools"),
    )
    tri = triples.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_triples")
    )
    tp = (
        triples.groupBy("conv_id", "pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("conv_id")
        .agg(F.max(F.struct("cnt", "pred")).alias("m"))
        .select("conv_id", F.col("m.pred").alias("top_pred"))
    )
    return (
        base.join(tri, "conv_id", "left")
        .join(tp, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            "n_user_turns",
            "n_assistant_turns",
            "n_tool_calls",
            "duration_ms",
            "tools",
            F.coalesce("n_triples", F.lit(0).cast("long")).alias("n_triples"),
            F.coalesce("top_pred", F.lit("")).alias("top_pred"),
        )
    )


def tool_ngrams(transcripts: DataFrame, n: int = 3, k: int = 20) -> DataFrame:
    """Top-``k`` most frequent tool-call ``n``-grams across
    conversations — ``(gram, n_occurrences, n_convs)`` with the gram
    serialized ``"a>b>c"``. Where ``tool_transitions`` gives the
    1-step funnel, this mines the actual multi-step playbooks
    ("search>db_query>calculator") an agent-ops team audits and a
    tool-policy distillation samples.

    Plan: each conversation's tool sequence assembles in one conv_id
    groupBy (buffer bounded by conversation length — the same bound as
    the content hash in conv_dedup); gram enumeration is row-local
    slicing; counts reduce map-side on gram keys whose cardinality is
    bounded by |tools|^n; the top-k compiles to TakeOrderedAndProject
    (per-task local top-k — no global sort). Ties break (count desc,
    gram asc): a total order, so the cut is deterministic.
    """
    seq = (
        transcripts.where(F.col("tool").isNotNull())
        .groupBy("conv_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("turn_idx", "tool"))),
                lambda s: s["tool"],
            ).alias("s")
        )
        .where(F.size("s") >= n)
    )
    grams = seq.select(
        "conv_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s") - (n - 1)),
                lambda i: F.array_join(F.slice("s", i, n), ">"),
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(k)
    )


def retry_runs(transcripts: DataFrame, min_len: int = 2) -> DataFrame:
    """Tool-retry bursts — maximal streaks of CONSECUTIVE tool calls
    that invoke the same tool within one conversation:
    ``(conv_id, tool, start_turn, end_turn, run_len, span_ms)``.
    A streak is consecutive in the conversation's TOOL-CALL sequence
    (intervening user/assistant turns don't break it — the agent went
    straight back to the same tool), and only streaks of at least
    ``min_len`` calls are emitted: those are the retry loops /
    stuck-agent signatures an agent-ops dashboard alerts on and a
    curation pipeline down-weights before training on the transcript.

    Device: gaps-and-islands. ``seq`` numbers the conversation's tool
    calls; ``seq - row_number() over (conv, tool order seq)`` is
    constant exactly along a same-tool streak, so one aggregate keyed
    on (conv_id, tool, island) collapses each streak to a row. Both
    windows partition by ``conv_id`` (bounded by conversation length,
    the same bound every transcript window in this repo rides); the
    final aggregate is map-side combinable on keys that live inside
    one conversation, so the whole operator is a single exchange on
    conv_id no matter the corpus size.

    ``span_ms`` is the integer epoch-millisecond delta from the
    streak's first to last call — exact on any engine; no floats
    anywhere in the operator.
    """
    w_conv = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = (
        transcripts.where(F.col("tool").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            "tool",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        )
        .withColumn("seq", F.row_number().over(w_conv))
    )
    w_tool = Window.partitionBy("conv_id", "tool").orderBy("seq")
    islands = calls.withColumn(
        "island", F.col("seq") - F.row_number().over(w_tool)
    )
    return (
        islands.groupBy("conv_id", "tool", "island")
        .agg(
            F.min("turn_idx").alias("start_turn"),
            F.max("turn_idx").alias("end_turn"),
            F.count(F.lit(1)).alias("run_len"),
            (F.max("ms") - F.min("ms")).alias("span_ms"),
        )
        .where(F.col("run_len") >= min_len)
        .select(
            "conv_id", "tool", "start_turn", "end_turn", "run_len", "span_ms"
        )
    )


def conv_extractive_summary(transcripts: DataFrame) -> DataFrame:
    """Extractive conversation summaries — ``(conv_id, segment_id,
    turn_idx, score_micro)``: for every topic segment (the
    ``topic_segments`` lexical-cohesion cuts), the single most
    informative turn, ranked by summed smoothed-idf mass of the turn's
    distinct lowercase tokens. One representative turn per topic is
    the classic extractive transcript summary — the distillation /
    preview text a conversation index stores, at ~one-tenth the
    tokens.

    Determinism: token idf uses the tfidf_top_terms contract —
    ``ln((N+1)/(df+1)) + 1`` with ``df`` the number of TURNS containing
    the token and ``N`` the total turn count — and every per-token score is
    floored onto the 1e-6 integer grid BEFORE the per-turn sum
    (float-addition order never matters: both engines sum identical
    int64s). Ties break to the earliest turn. Token-free turns score
    0.

    Scale shape: per-turn distinct tokens explode into slim
    (conv, turn, token) rows; the turn-frequency census is ONE
    map-side-combinable count on the token key (distinct-per-turn
    makes count(*) the df); the idf join is a plain hash join on the
    uniform token key; the per-turn sum and the per-(conv, segment)
    arg-max window are both bounded by conversation length — the same
    bound every transcript window here rides. N arrives as a broadcast
    1-row dimension.
    """
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " "),
            lambda t: t != F.lit(""),
        )
    )
    base = transcripts.select("conv_id", "turn_idx", toks.alias("toks"))
    tok_rows = base.select(
        "conv_id", "turn_idx", F.explode("toks").alias("token")
    )
    dfreq = tok_rows.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = base.agg(F.count(F.lit(1)).alias("n_turns"))
    scored = (
        tok_rows.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "conv_id",
            "turn_idx",
            F.floor(
                F.lit(1e6)
                * (
                    F.log(
                        (F.col("n_turns") + 1).cast("double")
                        / (F.col("df") + 1)
                    )
                    + F.lit(1.0)
                )
            ).cast("long").alias("tok_score"),
        )
        .groupBy("conv_id", "turn_idx")
        .agg(F.sum("tok_score").alias("score_micro"))
    )
    seg = topic_segments(transcripts).select(
        "conv_id", "turn_idx", "segment_id"
    )
    joined = seg.join(scored, ["conv_id", "turn_idx"], "left").select(
        "conv_id",
        "segment_id",
        "turn_idx",
        F.coalesce("score_micro", F.lit(0)).cast("long").alias("score_micro"),
    )
    w = Window.partitionBy("conv_id", "segment_id").orderBy(
        F.desc("score_micro"), F.asc("turn_idx")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("conv_id", "segment_id", "turn_idx", "score_micro")
    )


# word inventories for the first-token dialog-act rules: the corpus is
# synthetic word-salad (no punctuation), so acts key off lexical
# markers rather than syntax — the same rule set is restated in the
# DuckDB oracle, making the inventory part of the operator spec.
ACT_COMMAND_WORDS = [
    "build", "check", "compare", "deliver", "find", "give", "list",
    "look", "make", "note", "open", "order", "plan", "query", "return",
    "review", "run", "scan", "ship", "show", "sort", "take", "tell",
    "test", "update",
]
ACT_ACK_WORDS = ["maybe", "no", "okay", "quite", "really", "sure", "yes"]
ACT_QUESTION_WORDS = ["how", "what", "when", "where", "which", "who", "why"]


def dialog_acts(transcripts: DataFrame) -> DataFrame:
    """Per-turn dialog-act classification ``(conv_id, turn_idx, role,
    act)`` by deterministic lexical rules, precedence: 'question' if
    ANY token is an interrogative marker (or the turn ends with '?'),
    else 'ack' / 'command' by the FIRST token's inventory, else
    'tool_result' for tool turns, else 'statement'. The act histogram
    is the standard first cut for conversation-corpus triage (which
    dialogues are instruction-shaped vs chit-chat) before SFT
    selection.

    Row-local (one lowercase split per turn, array membership via
    literal inventories) — zero shuffle, whole-stage codegen.
    """
    toks = F.split(F.lower(F.col("text")), " ")
    qset = F.array(*[F.lit(x) for x in ACT_QUESTION_WORDS])
    ackset = F.array(*[F.lit(x) for x in ACT_ACK_WORDS])
    cmdset = F.array(*[F.lit(x) for x in ACT_COMMAND_WORDS])
    first = F.element_at(toks, 1)
    act = (
        F.when(
            F.arrays_overlap(toks, qset) | F.col("text").endswith("?"),
            F.lit("question"),
        )
        .when(F.array_contains(ackset, first), F.lit("ack"))
        .when(F.array_contains(cmdset, first), F.lit("command"))
        .when(F.col("role") == "tool", F.lit("tool_result"))
        .otherwise(F.lit("statement"))
    )
    return transcripts.select("conv_id", "turn_idx", "role", act.alias("act"))
