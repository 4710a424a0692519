"""Property-based conformance tests (hypothesis).

Spark-free: they pin the plain-Python layers the distributed operators
are tested against — extraction state machines vs the batched
implementations, and the tri-implemented hash spec (Python vs DuckDB;
the Spark side is covered by test_kg_stages against the same kg.py).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from ner_spark import kg
from ner_spark.operators.extraction import _bio_segments, _extract_bioes_batch
from ner_spark.oracle.reference import extract_bio, extract_bioes, join_tokens

TYPES = ["brand", "product", "color", ""]
BIO_TAGS = ["O"] + [f"{p}-{t}" if t else p for p in "BI" for t in TYPES]
BIOES = ["O", "B", "I", "E", "S"]

bio_seq = st.lists(st.sampled_from(BIO_TAGS), max_size=24)


@settings(max_examples=300, deadline=None)
@given(bio_seq)
def test_bio_segments_equal_oracle(tags):
    toks = [f"w{i}" for i in range(len(tags))]
    segs = _bio_segments(tags)
    pairs = {(t, join_tokens(toks[s:e])) for (s, e, t) in segs}
    assert pairs == extract_bio(tags, toks)
    # spans are well-formed, non-overlapping, in order
    last_end = 0
    for (s, e, _t) in segs:
        assert 0 <= s < e <= len(tags)
        assert s >= last_end
        last_end = e


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(BIOES), st.sampled_from(["x", "y", "null"])),
        max_size=24,
    )
)
def test_bioes_batch_equals_oracle(seq):
    bio = [b for b, _a in seq]
    attrs = [a for _b, a in seq]
    toks = [f"w{i}" for i in range(len(seq))]
    batch = _extract_bioes_batch([bio], [toks], [attrs])[0]
    got = {(m["pred"], m["obj"]) for m in batch}
    assert got == extract_bioes(bio, toks, attrs)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=32, max_codepoint=126, exclude_characters="'\\"
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_minhash_spec_python_duckdb_parity(shingles):
    """The Python hash spec and the DuckDB SQL restatement used by the
    driver oracles compute bit-identical signatures on arbitrary ASCII
    shingle sets."""
    sig_py = kg.minhash_signature(shingles)
    lit = "[" + ",".join("'" + s + "'" for s in shingles) + "]"
    hs = (
        f"list_transform({lit}, x -> "
        f"(('0x' || substring(md5(x), 1, 15))::BIGINT & {kg.H31_MASK}))"
    )
    parts = ",".join(
        f"list_min(list_transform({hs}, h -> ({a} * h + {b}) % {kg.MERSENNE61}))"
        for a, b in zip(kg.MINHASH_A, kg.MINHASH_B)
    )
    sig_duck = duckdb.sql(f"SELECT [{parts}]").fetchone()[0]
    assert sig_duck == sig_py


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_normalize_surface_canonical_form(s):
    """True invariants of the normalization (note: NOT idempotence —
    the single-pass suffix strip means 'acme inc inc' → 'acme inc' →
    'acme'; the Spark/SQL restatements are also single-pass, so the
    three implementations agree, which is the property that matters)."""
    n = kg.normalize_surface(s)
    assert n == n.lower()
    assert "  " not in n
    assert n == n.strip()


MTYPES = ["brand", "product", "color", "person", "org", "place"]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(MTYPES),
            st.sampled_from(["acme", "blue", "widget", "paris", "ada"]),
            st.integers(min_value=0, max_value=10),
        ),
        max_size=6,
    )
)
def test_relate_mentions_upper_triangle_equals_spec(ms):
    """The upper-triangle implementation equals the quadratic definition
    (every ordered pair with subj span strictly before obj span, matched
    against the rule table) on arbitrary mention sets."""
    got = kg.relate_mentions(ms)
    sorted_ms = sorted(ms, key=lambda m: (m[2], m[0], m[1]))
    want = []
    for a in sorted_ms:
        for b in sorted_ms:
            if a is b or a[2] >= b[2]:
                continue
            pred = kg.REL_RULES.get((a[0], b[0]))
            if pred is not None:
                want.append((a[0], a[1], pred, b[0], b[1]))
    assert sorted(got) == sorted(want)
