"""Structured Streaming ingest: continuous transcripts → triples.

The reference is strictly batch (SURVEY §2.10 — epoch loops over
materialized lists, /root/reference/utils.py:83-114), so no streaming
semantics are *ported*; this module is the production ingestion mode the
10^12-turn deployment needs: transcripts land continuously (file/Iceberg
commits), and the tag→extract→triples slice runs incrementally with
exactly-once sink semantics instead of recomputing the corpus.

Design notes (Spark-first):
* every operator in the tag→extract slice is stateless and row-local
  (``mapInPandas`` tagger, extraction pandas UDF, explode), so the whole
  pipeline is legal in ``append`` mode with NO state store — the
  streaming plan is the batch plan re-planned per micro-batch;
* file-source + checkpointLocation gives exactly-once: a re-run after
  failure or new-data arrival processes only unseen files (the streaming
  analogue of the batch manifest protocol in operators/manifest.py);
* ``Trigger.AvailableNow`` drains the backlog and stops — the
  batch-parity mode used in tests; a real deployment drops the trigger
  for continuous micro-batches;
* the windowed rollup shows event-time semantics over ``ts`` with a
  watermark bounding state: late turns beyond the watermark are dropped
  from the aggregation (the documented trade — the batch pipeline is the
  source of truth; the stream serves freshness).

The batch pipeline's ``repartitionByRange`` ordering step is NOT applied
here: range repartitioning needs a global sample of the batch and is
meaningless across micro-batches. Extraction is row-local so triple
correctness does not depend on it (asserted in tests: streaming output ==
batch output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def stream_transcripts(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source streaming scan of a transcripts directory. The schema
    is explicit (streaming sources cannot infer), matching input_hint."""
    r = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def _streaming_mentions(
    transcripts: DataFrame, carry: tuple[str, ...] = ("conv_id", "turn_idx")
) -> DataFrame:
    """Shared stateless prelude: the FUSED tag+extract stage (same
    operator as the batch hot path — one Python boundary) on a streaming
    DataFrame. Columns are pruned to ``carry`` + text BEFORE the opaque
    mapInPandas boundary — Catalyst cannot push pruning through it, and
    unused columns (tool, role) would round-trip through Arrow per turn
    for nothing."""
    from ner_spark.operators.tagging import tag_and_extract

    cols = list(dict.fromkeys([*carry, "text"]))
    return tag_and_extract(transcripts.select(*cols))


def _streaming_pairs(transcripts: DataFrame) -> DataFrame:
    """Per-turn deduped (pred, obj) pairs with ts carried for event-time
    consumers: (conv_id, turn_idx, ts, pred, obj)."""
    from ner_spark.operators.extraction import distinct_pairs

    m = _streaming_mentions(transcripts, carry=("conv_id", "turn_idx", "ts"))
    return m.withColumn(
        "pair", F.explode(distinct_pairs(F.col("mentions")))
    ).select(
        "conv_id",
        "turn_idx",
        "ts",
        F.col("pair.pred").alias("pred"),
        F.col("pair.obj").alias("obj"),
    )


def streaming_triples(transcripts: DataFrame) -> DataFrame:
    """The batch tag→extract→triples slice applied to a streaming
    DataFrame — identical operators, stateless, append-mode legal."""
    from ner_spark.operators.extraction import mentions_to_triples

    return mentions_to_triples(_streaming_mentions(transcripts))


def windowed_triple_counts(
    transcripts: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time rollup: triple counts per (tumbling ts window, pred)
    with a watermark bounding the state store — late turns past the
    watermark no longer update closed windows. The watermark is attached
    directly before the stateful aggregation (after the stateless
    UDF stages) so event-time tracking is unambiguous."""
    pairs = _streaming_pairs(transcripts)
    return (
        pairs.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "pred")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "pred",
            "n_triples",
        )
    )


NEW_TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
    ]
)

# fixed-width state: each seen pair is an 8-byte hash, not the raw
# 'pred\x01obj' string — per-conversation state is 8 B/fact regardless of
# mention text length, which is what keeps a hot conversation's state
# bounded over the stream's lifetime at deployment scale.
# STATE FORMAT v2 (array<long>; v1 stored raw strings): a checkpoint
# written under v1 is NOT restorable — Spark's state store rejects the
# schema change loudly. Deployments upgrading across this boundary must
# start a fresh checkpoint (the batch pipeline is the source of truth;
# the only cost is one-time re-emission of known facts).
_DEDUP_STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.LongType()), False)]
)


def _pair_hash(pred: str, obj: str) -> int:
    """64-bit truncated md5 of the pair key. Collision odds at n seen
    pairs ≈ n²/2⁶⁵ (~3e-8 at a million facts in ONE conversation); a
    collision suppresses a single novel fact from the incremental feed —
    the batch pipeline, which is the source of truth, still emits it."""
    import hashlib

    d = hashlib.md5(f"{pred}\x01{obj}".encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big", signed=True)


def _make_dedup(state_ttl_ms: int | None):
    """The per-group stateful handler behind ``streaming_new_triples``,
    factored out so the timeout/eviction branches are unit-testable
    against a fake GroupState (a wall-clock timer cannot be driven
    deterministically in a test)."""

    def dedup(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            # idle past the TTL: evict. No input rows accompany a
            # timeout invocation, so nothing is emitted. The empty frame
            # carries EXPLICIT dtypes matching NEW_TRIPLES_SCHEMA — an
            # untyped empty frame is all-object, and Arrow's schema
            # coercion of object->int32 for turn_idx on a live query is
            # exactly the kind of edge this branch must not leave to
            # chance. Exercised on a REAL interval-trigger query by
            # tests/test_streaming.py::test_ttl_eviction_live_interval_trigger.
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "turn_idx": pd.Series([], dtype="int32"),
                    "subj": pd.Series([], dtype="object"),
                    "pred": pd.Series([], dtype="object"),
                    "obj": pd.Series([], dtype="object"),
                }
            )
            return
        conv_id = key[0]
        # GroupState.get is a PROPERTY in PySpark (returns the tuple)
        seen = set(state.get[0]) if state.exists else set()
        # concatenate ALL the group's chunks before sorting: per-chunk
        # sorting would attribute a pair's first sighting to whichever
        # Arrow chunk arrived first — nondeterministic across runs
        chunks = [pdf for pdf in pdf_iter]
        out = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["turn_idx", "pred", "obj"]
            )
            for r in pdf.itertuples(index=False):
                k = _pair_hash(r.pred, r.obj)
                if k not in seen:
                    seen.add(k)
                    out.append(
                        (conv_id, int(r.turn_idx), f"{conv_id}#{int(r.turn_idx)}", r.pred, r.obj)
                    )
        state.update((sorted(seen),))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            out, columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
        )

    return dedup


def streaming_new_triples(
    transcripts: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    emit each conversation's (pred, obj) pair only the FIRST time it is
    ever observed across the stream's lifetime — incremental KG fact
    dedup, so downstream consumers never re-process known facts.

    State = the per-conversation set of seen pair-key hashes, kept in the
    state store and restored per micro-batch. The stateless tag+extract
    stages run before the stateful groupBy, so the only stateful shuffle
    keys on conv_id; a pathologically hot conversation concentrates state
    but not compute (its turns still tag in parallel upstream — only the
    pair dedup serializes per conversation, and pairs ≪ turns).

    ``state_ttl_ms`` (e.g. 30 days = 2_592_000_000) switches to a
    processing-time timeout (PySpark's ``setTimeoutDuration`` takes int
    milliseconds) that evicts a conversation's state after that idle
    period —
    the second half of the state bound: conversations end, and an evicted
    conversation that somehow resumes may re-emit known facts, which the
    downstream batch canonicalization dedups anyway. Default (None) keeps
    exact first-sighting semantics forever.

    Operational caveat (observed on pyspark 4.1.2): a TTL-armed query
    does not terminate under ``Trigger.AvailableNow`` — the drain waits
    on pending processing-time timers. Use the TTL only with continuous
    or interval triggers (the deployment mode it exists for); the
    timeout branch is driven directly in tests/test_streaming.py."""
    pairs = _streaming_pairs(transcripts).select(
        "conv_id", "turn_idx", "pred", "obj"
    )
    return pairs.groupBy("conv_id").applyInPandasWithState(
        _make_dedup(state_ttl_ms),
        outputStructType=NEW_TRIPLES_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout" if state_ttl_ms is None else "ProcessingTimeTimeout",
    )


def run_new_triples_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_ttl_ms: int | None = None,
    available_now: bool = True,
):
    """Start the stateful first-sighting dedup stream against a landing
    dir, enforcing the TTL/trigger compatibility rule IN CODE:

    On pyspark 4.1.2 a TTL-armed (ProcessingTimeTimeout) query under
    ``Trigger.AvailableNow`` never terminates — the drain waits on
    pending processing-time timers (pinned by
    tests/test_streaming.py::test_ttl_available_now_incompatibility_pinned).
    A docstring caveat is not a safe failure mode for the bounded-state
    deployment path, so this runner refuses the combination up front
    instead of hanging the caller. TTL mode requires a continuous or
    interval trigger (``available_now=False``).

    Returns the started StreamingQuery. With ``available_now`` (TTL off)
    the call blocks until the backlog drains, mirroring
    ``run_triples_stream``; otherwise the caller owns the query
    lifecycle."""
    if available_now and state_ttl_ms is not None:
        raise ValueError(
            "state_ttl_ms requires a continuous/interval trigger: "
            "Trigger.AvailableNow never terminates with pending "
            "processing-time timers on pyspark 4.1.2 — run with "
            "available_now=False (long-lived query), or drop the TTL "
            "for drain-and-stop semantics"
        )
    triples = streaming_new_triples(
        stream_transcripts(spark, input_dir), state_ttl_ms=state_ttl_ms
    )
    w = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return w.start()


def run_triples_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> None:
    """Drain ``input_dir`` into a parquet triples sink with exactly-once
    file tracking under ``checkpoint_dir``. With ``available_now`` the
    call blocks until the backlog is consumed (test/batch-parity mode)."""
    triples = streaming_triples(stream_transcripts(spark, input_dir))
    w = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = w.trigger(availableNow=True).start()
    else:
        q = w.start()
    q.awaitTermination()


def session_windows(
    df: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    time_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Event-time sessionization via Spark's native ``session_window``
    aggregation — ``(key, n_events, start_ep, end_ep)`` with the epoch
    bounds of each session's first/last event. Two events share a
    session iff their gap is <= ``gap`` (Spark merges windows that
    touch: an event exactly ``gap`` after the previous one EXTENDS the
    session — probed and pinned by test, and mirrored as the strict
    ``> gap`` break in the DuckDB lag-cumsum oracle).

    The SAME call serves batch and streaming frames: on a streaming
    frame pass ``watermark`` so the state store evicts sessions once
    the watermark passes their close (the unbounded-state guard
    SURVEY §7.4 requires of every stateful streaming op); on a batch
    frame the watermark is skipped (it would be a no-op column nudge).

    Scale shape: ONE exchange keyed on the session key; Spark's
    session-window operator merges per-key windows in sorted order
    (spill-safe, state bounded by open sessions per key) — the same
    cost model as the lag-cumsum batch device but maintainable
    incrementally by Structured Streaming.
    """
    src = df
    if watermark is not None and df.isStreaming:
        src = df.withWatermark(time_col, watermark)
    return (
        src.groupBy(
            F.col(key_col),
            F.session_window(F.col(time_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_timestamp(F.min(time_col)).alias("start_ep"),
            F.unix_timestamp(F.max(time_col)).alias("end_ep"),
        )
        .select(key_col, "n_events", "start_ep", "end_ep")
    )
