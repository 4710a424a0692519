"""Edge-case transcripts through the REAL pipeline surface.

Inputs the fixture generator never produces: empty text, single token,
unicode, multi-space (empty tokens), a degenerate 5000-token repeated
turn, and a null-ish role. The pipeline must neither crash nor drift
from the row-wise oracle computed inline (shared deterministic weights),
at any parallelism.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ner_spark.model.tagger import TAG_NAMES, token_logits_batch, transitions
from ner_spark.oracle.reference import extract_bio, viterbi_decode


def _oracle_triples(conv_id, turn_idx, text):
    toks = text.split(" ") if text else []
    if not toks:
        return set()
    unary = token_logits_batch([toks])[0]
    tags = [TAG_NAMES[i] for i in viterbi_decode(unary, transitions())]
    return {
        (conv_id, turn_idx, f"{conv_id}#{turn_idx}", ty, tx)
        for (ty, tx) in extract_bio(tags, toks)
    }


EDGE_TURNS = [
    ("c-empty", 0, ""),
    ("c-single", 0, "acme"),
    ("c-single", 1, "the"),
    ("c-unicode", 0, "héllo wörld 北京 acme gmbh"),
    ("c-multispace", 0, "acme  ltd   widget"),  # empty tokens survive split
    ("c-long", 0, " ".join(["the"] * 5000)),
    ("c-long", 1, " ".join(f"tok{i}" for i in range(3000))),
]


@pytest.fixture(scope="module")
def edge_df(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path_factory.mktemp("edge") / "t.parquet")
    df = pd.DataFrame(
        [
            {
                "conv_id": c,
                "turn_idx": i,
                "role": "user",
                "text": t,
                "tool": None,
                "ts": pd.Timestamp("2026-01-01"),
            }
            for (c, i, t) in EDGE_TURNS
        ]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    return spark.read.parquet(p)


def test_edge_inputs_match_oracle(spark, edge_df):
    from ner_spark.operators.extraction import mentions_to_triples
    from ner_spark.pipeline import build_mentions

    got = {
        tuple(r)
        for r in mentions_to_triples(build_mentions(edge_df)).collect()
    }
    want = set()
    for (c, i, t) in EDGE_TURNS:
        want |= _oracle_triples(c, i, t)
    assert got == want


def test_edge_inputs_parallelism_invariant(spark, edge_df):
    from ner_spark.operators.extraction import mentions_to_triples
    from ner_spark.pipeline import build_mentions

    one = {
        tuple(r)
        for r in mentions_to_triples(
            build_mentions(edge_df.coalesce(1))
        ).collect()
    }
    many = {
        tuple(r)
        for r in mentions_to_triples(
            build_mentions(edge_df.repartition(7))
        ).collect()
    }
    assert one == many


def test_null_text_through_hygiene_and_pair_ops(spark):
    """Null/empty text rows must flow through the dataset-hygiene and
    pair operators without errors and without fabricating matches."""
    from pyspark.sql import functions as F

    from ner_spark.functions.datasets import contaminated_docs
    from ner_spark.functions.dedup import token_jaccard_pairs

    corpus = spark.createDataFrame(
        [(0, "en", None), (1, "en", ""), (2, "en", "a b c d"), (3, "en", "a b c d")],
        "doc_id long, lang string, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in token_jaccard_pairs(corpus, threshold=0.7).collect()
    }
    assert pairs == {(2, 3)}  # null/empty rows never pair

    bench = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
    flagged = {r["doc_id"] for r in contaminated_docs(corpus, bench, n=8).collect()}
    assert flagged == {2, 3}  # whole-text gram match; null/empty unflagged


def test_sample_frames_zero_frames_empty(spark):
    from pyspark.sql import functions as F

    from ner_spark.functions.multimodal import sample_frames

    df = spark.createDataFrame([(0, 0), (1, 1), (2, 25)], "doc_id long, n_frames int")
    got = {
        r["doc_id"]: r["sampled_frames"]
        for r in sample_frames(df, every=10).collect()
    }
    assert got == {0: [], 1: [0], 2: [0, 10, 20]}


def test_transcript_analytics_on_edge_inputs(spark, edge_df):
    """The session-4 transcript analytics must survive the degenerate
    corpus (empty text, 5000-token turn, all-null tools, single-turn
    conversations) without crashing or emitting malformed rows."""
    from ner_spark.functions.dedup import conv_dedup
    from ner_spark.operators.segments import (
        conv_cards,
        tool_ngrams,
        topic_segments,
        tool_transitions,
        turn_latency,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")

    dd = {r["conv_id"]: r for r in conv_dedup(edge_df).collect()}
    assert len(dd) == edge_df.select("conv_id").distinct().count()
    assert all(r["is_dup"] == 0 for r in dd.values())  # no dups here

    seg = topic_segments(edge_df).collect()
    assert len(seg) == edge_df.count()
    firsts = [r for r in seg if r["turn_idx"] == 0]
    assert all(r["jaccard_micro"] == -1 and r["segment_id"] == 0 for r in firsts)

    # every ts identical -> all gaps are 0, no negative/null leakage
    for r in turn_latency(edge_df).collect():
        assert r["max_gap_ms"] == 0 and r["mean_gap_ms"] == 0

    # all tools are null: the tool views are empty, not crashed
    assert tool_transitions(edge_df).count() == 0
    assert tool_ngrams(edge_df).count() == 0

    triples = spark.createDataFrame(
        [], "conv_id string, turn_idx long, subj string, pred string, obj string"
    )
    cards = {r["conv_id"]: r for r in conv_cards(edge_df, triples).collect()}
    assert cards["c-empty"]["n_triples"] == 0
    assert cards["c-empty"]["top_pred"] == ""
    assert cards["c-empty"]["tools"] == ""
    assert cards["c-long"]["n_turns"] == 2


def test_round4_operators_degenerate_inputs(spark):
    """Degenerate corpora the fixtures never produce, one assertion per
    pinned edge semantics of the round-4 operators."""
    from ner_spark.functions.datasets import dsir_weights
    from ner_spark.functions.similarity import (
        hard_negatives,
        ivf_topk,
        pq_adc_topk,
        semantic_dedup,
    )
    from ner_spark.operators.graph import verbalize_entities

    # dsir: empty target slice -> weights still defined (pure raw side);
    # single-token doc scores unigrams only; empty corpus -> empty out
    d = spark.createDataFrame(
        [(0, "alpha beta", "web"), (1, "gamma", "web")],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r for r in dsir_weights(d, target_source="tgt").collect()}
    assert out[0]["n_feats"] == 3 and out[1]["n_feats"] == 1  # uni+bi vs uni
    assert all(r["logw"] is not None for r in out.values())
    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert dsir_weights(empty).count() == 0

    # embeddings: 6 orthogonal-ish vectors
    import random as _r

    rng = _r.Random(1)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    # semantic_dedup at an impossible threshold keeps everything
    assert all(
        r["keep"] for r in semantic_dedup(emb, threshold=1.000001, n_cells=2).collect()
    )
    # hard_negatives with an empty band emits nothing; with the full
    # band it equals ivf_topk's ranking exactly (same machinery)
    assert hard_negatives(emb, k=3, lo=0.99, hi=0.991, n_cells=2).count() in (0, 1, 2)
    wide = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in hard_negatives(
            emb, queries=emb, k=3, lo=-1.0, hi=1.1, n_cells=2, nprobe=2
        ).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb, emb, k=3, n_cells=2, nprobe=2).collect()
    }
    assert wide == ivf

    # pq_adc: k beyond the candidate count just returns all candidates,
    # ranks dense from 1
    rows = pq_adc_topk(
        emb, emb.where(F.col("vec_id") == 0), k=100,
        n_sub=2, n_cells_pq=2, n_cells_ivf=2, dim=8, nprobe=1,
    ).collect()
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    assert all(r["query_id"] == 0 and r["neighbor_id"] != 0 for r in rows)

    # verbalize: empty triple frame -> empty output; single fact renders
    t0 = spark.createDataFrame(
        [], "conv_id string, turn_idx long, subj string, pred string, obj string"
    )
    assert verbalize_entities(t0).count() == 0
    t1 = spark.createDataFrame(
        [("c", 0, "s|x", "p", "o|y")],
        "conv_id string, turn_idx long, subj string, pred string, obj string",
    )
    r = verbalize_entities(t1).collect()[0]
    assert r["card_text"] == "s|x: p o|y." and r["n_facts"] == 1


def test_round4_ops_on_edge_inputs(spark, edge_df):
    """The round-4 continuation operators must survive degenerate
    inputs — all-null tools, empty edge/node/triple frames, empty or
    token-free documents — without crashing or emitting rows they
    shouldn't."""
    from ner_spark.functions.corpus import novelty_scores, perplexity_buckets
    from ner_spark.functions.pack import curriculum_schedule
    from ner_spark.functions.text import lm_topk
    from ner_spark.operators.graph import (
        entity_bursts,
        entity_salience,
        fact_confidence,
        motif_census,
        node_features,
        supergraph,
    )
    from ner_spark.operators.segments import retry_runs

    spark.conf.set("spark.sql.session.timeZone", "UTC")

    # all tools are null -> no calls, no runs
    assert retry_runs(edge_df).count() == 0

    empty_edges = spark.createDataFrame(
        [], "src_entity string, pred string, dst_entity string, n_turns bigint"
    )
    empty_nodes = spark.createDataFrame(
        [],
        "entity_id string, entity_type string, canonical_name string, "
        "n_surfaces bigint, n_mentions bigint",
    )
    empty_triples = spark.createDataFrame(
        [], "conv_id string, turn_idx long, subj string, pred string, obj string"
    )
    assert supergraph(empty_edges).count() == 0
    assert motif_census(empty_edges).count() == 0
    assert node_features(empty_nodes, empty_edges).count() == 0
    assert fact_confidence(empty_triples).count() == 0
    assert entity_salience(empty_triples).count() == 0
    assert entity_bursts(empty_triples, edge_df).count() == 0

    # degenerate documents: empty text, whitespace runs, unicode
    # (unique doc ids — EDGE_TURNS reuses turn_idx across conversations)
    from pyspark.sql import Window

    docs = edge_df.select(
        (
            F.row_number().over(
                Window.orderBy("conv_id", "turn_idx")
            ).cast("long")
        ).alias("doc_id"),
        "text",
    )
    nv = {r.doc_id: r.novelty_micro for r in novelty_scores(docs).collect()}
    assert len(nv) == docs.count()  # every doc keeps a row
    cs = curriculum_schedule(docs, budget=10)
    assert cs.count() == docs.count()
    pb = perplexity_buckets(docs)
    assert pb.count() == docs.count()
    assert lm_topk(docs, ["nonexistent-term-xyz"], k=5).count() == 0
