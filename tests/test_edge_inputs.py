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
