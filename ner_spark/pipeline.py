"""End-to-end KG-construction pipeline (SURVEY §3 "Lifecycle").

transcripts → [ingest] repartitionByRange(conv_id, turn_idx)
           → [tag]     mapInPandas forward + batched NumPy Viterbi (EP3)
           → [extract] BIO span UDF → mentions
           → [triples] per-turn deduped (pred, obj) pairs, turn-anchored
           → [relate]  typed co-occurrence relations (M2)
           → [link]    normalize + MinHash-LSH + Jaccard scorer (M3)
           → [cc]      large-star/small-star canonical ids (M4)
           → [graph]   nodes / edges / canonical triples materialized
with every stage published through the manifest protocol (M5) so a rerun
resumes from the last complete stage.

Skew story (north_star): the hot conv_id (fixture: ~30% of all turns) is
split across range partitions because the range key includes turn_idx —
per-conversation order survives within each range slice, and no stage
groups by conv_id alone (relate groups by (conv_id, turn_idx); linking
groups by surface-derived keys), so no single task inherits the whole hot
conversation. ``salt_hot_convs`` exists for operators that DO need
conv-level aggregation and is applied to the per-conv turn reassembly
check in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.operators.components import canonicalize_triples, connected_components
from ner_spark.operators.extraction import extract_mentions_bio, mentions_to_triples
from ner_spark.operators.graph import materialize_edges, materialize_nodes
from ner_spark.operators.linking import link_edges
from ner_spark.operators.manifest import run_stage
from ner_spark.operators.relate import explode_mentions, extract_relations
from ner_spark.operators.tagging import tag_and_extract, tag_turns, with_tokens


@dataclass
class PipelineConfig:
    out_dir: str
    run_id: str = "run-0"
    resume: bool = True
    link_threshold: float = 0.55
    max_band_bucket: int | None = None
    range_partitions: int | None = None
    extra: dict = field(default_factory=dict)


STAGES = (
    "mentions",
    "triples",
    "relations",
    "surface_nodes",
    "link_edges",
    "assignment",
    "nodes",
    "edges",
    "canonical_triples",
)


def ingest(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Range-repartition on (conv_id, turn_idx): deterministic co-location
    of conversation slices without serializing hot conversations.

    Default partition count is 2× the core count, NOT 1×: one-task-per-
    core runs the whole stage as a single wave, so any straggler task
    (skewed range, page-cache miss, one slow core) extends the stage by
    its full overhang — measured as ±15% wall-time noise on the scaling
    bench. Two waves of half-size tasks let the scheduler absorb
    stragglers at negligible per-task overhead (4× was measured stabler
    still but ~15% slower from task fan-out costs — BENCH.md); the range
    co-location property is unchanged (just more ranges)."""
    n = num_partitions or (
        transcripts.sparkSession.sparkContext.defaultParallelism * 2
    )
    return transcripts.repartitionByRange(n, "conv_id", "turn_idx")


def salt_hot_convs(df: DataFrame, n_salts: int = 8) -> DataFrame:
    """Deterministic salt column for conv-level aggregations: spreads each
    conversation over ``n_salts`` sub-keys (pmod of a turn hash). Callers
    aggregate per (conv_id, salt) then merge — two-level aggregation."""
    return df.withColumn(
        "salt", F.pmod(F.hash("turn_idx"), F.lit(n_salts))
    )


def build_mentions(transcripts: DataFrame) -> DataFrame:
    # prune to the carried columns BEFORE the mapInPandas boundary:
    # Catalyst cannot push column pruning through an opaque Python stage,
    # and every extra column (tool, ts) would round-trip through Arrow
    # serialization for nothing. tag+extract run FUSED in one Python
    # stage (operators/tagging.py:tag_and_extract) — half the Arrow
    # traffic of tag_turns + extract_mentions_bio.
    slim = transcripts.select("conv_id", "turn_idx", "role", "text")
    return tag_and_extract(ingest(slim)).select(
        "conv_id", "turn_idx", "role", "text", "tags", "mentions"
    )


def run_pipeline(
    spark: SparkSession, transcripts: DataFrame, cfg: PipelineConfig
) -> dict[str, DataFrame]:
    """Run all stages under the manifest/resume protocol; returns the
    published DataFrames keyed by stage name. Every stage's manifest row
    is fingerprinted with the active weights-artifact version, so a
    model upgrade (new artifact) invalidates resumes of the whole run."""
    from ner_spark.model.artifact import verify_executor_weights

    out: dict[str, DataFrame] = {}
    # one trivial probe job proves the executor workers resolve the SAME
    # weights version the manifest is about to be stamped with. Runs
    # unconditionally: the mismatch can point either way (driver sees an
    # artifact the executors lack, OR spark.executorEnv points executors
    # at an artifact the driver never resolved — both would publish data
    # under the wrong fingerprint).
    fp = verify_executor_weights(spark)

    def _stage(name, compute):
        return run_stage(
            spark, cfg.out_dir, cfg.run_id, name, compute,
            resume=cfg.resume, fingerprint=fp,
        )

    mentions = _stage("mentions", lambda: build_mentions(transcripts))
    out["mentions"] = mentions

    out["triples"] = _stage("triples", lambda: mentions_to_triples(mentions))

    relations = _stage("relations", lambda: extract_relations(mentions))
    out["relations"] = relations

    # -- linking: surface nodes + scored link edges ------------------------
    # link_edges() eagerly materializes the node dimension
    # (localCheckpoint), so construct it LAZILY on first actual compute:
    # run_stage stays the single authority on whether a stage recomputes,
    # and a fully-resumed run never pays the linking job it skips.
    _link_memo: dict = {}

    def _links():
        if "v" not in _link_memo:
            _link_memo["v"] = link_edges(
                explode_mentions(mentions),
                threshold=cfg.link_threshold,
                max_band_bucket=cfg.max_band_bucket,
            )
        return _link_memo["v"]

    surface_nodes = _stage("surface_nodes", lambda: _links()[0])
    links = _stage("link_edges", lambda: _links()[1])
    out["surface_nodes"], out["link_edges"] = surface_nodes, links

    # -- canonicalization --------------------------------------------------
    assignment = _stage(
        "assignment",
        lambda: connected_components(
            surface_nodes, links,
            id_col="node_id", src_col="node_a", dst_col="node_b",
        ),
    )
    out["assignment"] = assignment

    # -- graph materialization ---------------------------------------------
    out["nodes"] = _stage(
        "nodes", lambda: materialize_nodes(surface_nodes, assignment)
    )
    out["edges"] = _stage(
        "edges", lambda: materialize_edges(relations, assignment)
    )
    out["canonical_triples"] = _stage(
        "canonical_triples",
        lambda: canonicalize_triples(relations, assignment, surface_nodes),
    )
    return out


def run_incremental(
    spark: SparkSession,
    delta_transcripts: DataFrame,
    cfg: PipelineConfig,
    base_run_id: str,
) -> dict[str, DataFrame]:
    """Merge a delta of NEW conversations into a prior run's published
    KG state, producing a full new run (same stage layout as
    ``run_pipeline``) that the next delta chains from — without
    re-tagging history (operators/incremental.py has the exactness
    argument; tests prove bit-identity with a batch rebuild under the
    default ``max_band_bucket=None`` — with a stop-band cap the chain
    is deliberately monotone where a rebuild would drop an over-cap
    bucket's old links, see the scope note in operators/incremental.py).

    Carried state is read from ``base_run_id``'s published
    ``surface_nodes`` / ``assignment`` / ``relations`` stages, and the
    base stages must be complete under the SAME weights fingerprint as
    this session resolves: a model upgrade between base and delta would
    otherwise silently merge two models' extractions into one KG — the
    fingerprint gate turns that into a loud error (re-run the base with
    the new artifact instead).

    Stage semantics under the new ``cfg.run_id``: ``mentions`` and
    ``triples`` are DELTA-scoped (this run's expensive tagging output;
    the corpus-wide view is their union across the chain), while
    ``relations``/``surface_nodes``/``assignment``/``nodes``/``edges``/
    ``canonical_triples`` are corpus-cumulative — exactly what the next
    ``run_incremental`` consumes. ``link_edges`` is not published: the
    incremental path only scores pairs touching new nodes (old
    connectivity arrives via the assignment's star edges), so there is
    no corpus-cumulative link-edge table to publish — connectivity lives
    in ``assignment``.
    """
    from ner_spark.model.artifact import verify_executor_weights
    from ner_spark.operators.incremental import incremental_update
    from ner_spark.operators.manifest import stage_complete, stage_data_path

    fp = verify_executor_weights(spark)

    def _base(stage: str) -> DataFrame:
        if not stage_complete(
            spark, cfg.out_dir, base_run_id, stage, fingerprint=fp
        ):
            raise RuntimeError(
                f"base run '{base_run_id}' stage '{stage}' is not complete "
                f"under weights fingerprint '{fp}' — the base must be a "
                "finished run of the SAME model artifact (re-run it after "
                "a model upgrade; incremental merge across model versions "
                "would mix extractions)"
            )
        return spark.read.parquet(
            stage_data_path(cfg.out_dir, base_run_id, stage)
        )

    old_surfaces = _base("surface_nodes")
    old_assignment = _base("assignment")
    old_relations = _base("relations")

    out: dict[str, DataFrame] = {}

    def _stage(name, compute):
        return run_stage(
            spark, cfg.out_dir, cfg.run_id, name, compute,
            resume=cfg.resume, fingerprint=fp,
        )

    mentions_d = _stage("mentions", lambda: build_mentions(delta_transcripts))
    out["mentions"] = mentions_d
    out["triples"] = _stage("triples", lambda: mentions_to_triples(mentions_d))

    # incremental_update eagerly localCheckpoints the merged surface
    # dimension, so construct it LAZILY on first actual compute (same
    # memo device as run_pipeline's linking pair): run_stage stays the
    # single authority on whether a stage recomputes, and a fully-
    # resumed incremental re-run never pays the merge job it skips.
    _inc_memo: dict = {}

    def _inc():
        if "v" not in _inc_memo:
            _inc_memo["v"] = incremental_update(
                old_surfaces,
                old_assignment,
                old_relations,
                explode_mentions(mentions_d),
                extract_relations(mentions_d),
                threshold=cfg.link_threshold,
                max_band_bucket=cfg.max_band_bucket,
            )
        return _inc_memo["v"]

    relations = _stage("relations", lambda: _inc()["relations"])
    out["relations"] = relations
    surfaces = _stage("surface_nodes", lambda: _inc()["surfaces"])
    out["surface_nodes"] = surfaces
    assignment = _stage("assignment", lambda: _inc()["assignment"])
    out["assignment"] = assignment

    out["nodes"] = _stage(
        "nodes", lambda: materialize_nodes(surfaces, assignment)
    )
    out["edges"] = _stage(
        "edges", lambda: materialize_edges(relations, assignment)
    )
    out["canonical_triples"] = _stage(
        "canonical_triples",
        lambda: canonicalize_triples(relations, assignment, surfaces),
    )
    return out
