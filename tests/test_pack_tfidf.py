"""Sequence packing (functions/pack.py) and TF-IDF (functions/text.py):
invariants beyond the DuckDB-oracle hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pack_sequences_budget_and_coverage(spark):
    """Every pack except the last holds exactly `budget` tokens; each
    doc's slices are contiguous, disjoint, and cover [0, n) in order."""
    from ner_spark.functions.pack import pack_sequences

    texts = ["w " * k for k in (3, 700, 12, 1, 513, 40, 511, 2)]
    texts = [t.strip() for t in texts]
    out = pack_sequences(_docs(spark, texts), budget=512).collect()

    by_pack = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], 0)
        by_pack[r["pack_id"]] += r["tok_end"] - r["tok_start"]
    packs = sorted(by_pack)
    assert packs == list(range(len(packs)))  # dense pack ids from 0
    assert all(by_pack[p] == 512 for p in packs[:-1])
    assert 0 < by_pack[packs[-1]] <= 512

    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["pack_id"], r["tok_start"], r["tok_end"])
        )
    for i, t in enumerate(texts):
        n = len(t.split(" "))
        slices = sorted(by_doc[i])
        assert slices[0][1] == 0 and slices[-1][2] == n
        for (pa, _sa, ea), (pb, sb, _eb) in zip(slices, slices[1:]):
            assert pb == pa + 1 and sb == ea  # contiguous, adjacent packs


def test_pack_sequences_bucket_size_invariant(spark):
    """The two-level prefix sum is layout-independent: any bucket_size
    yields byte-identical output (the scale knob changes the plan, never
    the result)."""
    from ner_spark.functions.pack import pack_sequences

    texts = [f"{'tok ' * (7 * i % 90 + 1)}".strip() for i in range(200)]
    d = _docs(spark, texts)
    a = sorted(map(tuple, pack_sequences(d, budget=128, bucket_size=4096).collect()))
    b = sorted(map(tuple, pack_sequences(d, budget=128, bucket_size=7).collect()))
    c = sorted(map(tuple, pack_sequences(d, budget=128, bucket_size=1).collect()))
    assert a == b == c


def test_tfidf_ranks_specific_terms_over_boilerplate(spark):
    """A term appearing in every doc (idf floor) must rank below a
    doc-unique term at equal tf; hand-checked top term on a tiny corpus."""
    from ner_spark.functions.text import tfidf_top_terms

    d = _docs(
        spark,
        [
            "the cat sat",
            "the dog ran",
            "the cat cat purred",
        ],
    )
    rows = tfidf_top_terms(d, k=2).collect()
    top = {r["doc_id"]: [] for r in rows}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["rk"])):
        top[r["doc_id"]].append(r["term"])
    # 'the' is in all 3 docs (df=3, idf = ln(4/4)+1 = 1, the floor);
    # doc-unique terms (df=1, idf = ln(2)+1) outrank it
    assert top[0][0] in {"cat", "sat"} and top[0] != ["the", "the"]
    assert "the" not in top[0][:1] and "the" not in top[1][:1]
    # doc 2: 'cat' tf=2 df=2 -> 2*(ln(4/3)+1)=2.575; unique 'purred'
    # 1*(ln(2)+1)=1.693; boilerplate 'the' = 1.0
    assert top[2][0] == "cat" and top[2][1] == "purred"


def test_bm25_topk_vs_pure_python(spark):
    """BM25 scores must equal a pure-Python Okapi implementation with
    the same int64 quantization; ordering is (score desc, doc_id asc),
    zero-score docs are excluded, and the limit binds."""
    import math

    from ner_spark.functions.text import bm25_topk

    corpus = [
        (0, "fast query engine for big query workloads"),
        (1, "join join join everything"),
        (2, "filter then join then filter again"),
        (3, "completely unrelated text about cats"),
        (4, "query"),
        (5, "the quick brown fox"),
    ]
    terms = ["query", "join", "filter"]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [(r.doc_id, r.score_micro) for r in bm25_topk(df, terms, k=3).collect()]

    k1, b = 1.2, 0.75
    docs = {i: t.split(" ") for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    exp = {}
    for i, toks in docs.items():
        s = 0
        for term in terms:
            dfreq = sum(1 for t2 in docs.values() if term in t2)
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            tf = toks.count(term)
            s += int(math.floor(
                1e6 * idf * (tf * (k1 + 1.0)
                             / (tf + k1 * ((1.0 - b) + b * (len(toks) / avgdl))))
            ))
        if s > 0:
            exp[i] = s
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == want and len(got) == 3
    # docs 3 and 5 (score 0) never appear even with a huge k
    all_rows = {r.doc_id for r in bm25_topk(df, terms, k=100).collect()}
    assert all_rows == set(exp)
    # empty corpus
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(empty, terms, k=5).count() == 0


def test_pack_sft_examples_invariants(spark):
    """Packed SFT windows: exact budget per non-final pack; each
    example's slices reconstruct its prompt+response token stream in
    order; n_loss per example sums to its response token count and
    never overlaps prompt positions; bucket_shift and partitioning
    leave the layout bit-identical."""
    from ner_spark.functions.pack import pack_sft_examples

    rows = []
    for c in range(6):
        # user->assistant pairs of varied lengths, plus noise turns
        rows += [
            (f"c{c}", 0, "user", f"ask {'q ' * (3 + c)}".strip()),
            (f"c{c}", 1, "assistant", f"ans {'r ' * (11 + 7 * c)}".strip()),
            (f"c{c}", 2, "tool", "tool output"),
            (f"c{c}", 3, "user", "followup question two"),
            (f"c{c}", 4, "assistant", f"{'x ' * (40 + c)}".strip()),
        ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    budget = 32
    out = pack_sft_examples(t, budget=budget).collect()

    by_pack, by_ex = {}, {}
    for r in out:
        by_pack[r["pack_id"]] = by_pack.get(r["pack_id"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
        by_ex.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
    packs = sorted(by_pack)
    assert packs == list(range(len(packs)))
    assert all(by_pack[p] == budget for p in packs[:-1])

    for (c, ti), slices in by_ex.items():
        slices.sort(key=lambda r: r["tok_start"])
        prompt = [x for x in rows if x[0] == c and x[1] == ti][0][3]
        resp = [x for x in rows if x[0] == c and x[1] == ti + 1][0][3]
        toks = prompt.split(" ") + resp.split(" ")
        n_prompt = len(prompt.split(" "))
        # contiguity + full coverage
        assert slices[0]["tok_start"] == 0
        assert slices[-1]["tok_end"] == len(toks)
        for a, b in zip(slices, slices[1:]):
            assert a["tok_end"] == b["tok_start"]
        # text reconstruction
        rebuilt = " ".join(s["pack_text"] for s in slices)
        assert rebuilt == " ".join(toks)
        # loss mask: exactly the response tokens, never prompt ones
        assert sum(s["n_loss"] for s in slices) == len(resp.split(" "))
        for s in slices:
            assert s["n_loss"] <= max(0, s["tok_end"] - max(s["tok_start"], n_prompt)) + 0
    # every pair (user->assistant adjacency) produced an example;
    # tool-broken adjacency did not
    assert {k[1] for k in by_ex} == {0, 3}

    # layout invariance across partitioning and bucket granularity
    a = sorted(map(tuple, out))
    for tf, shift in ((t.repartition(13), 45), (t, 50)):
        b = sorted(
            map(tuple, pack_sft_examples(tf, budget=budget, bucket_shift=shift).collect())
        )
        assert a == b


def test_chunk_windows_coverage_and_degenerates(spark):
    """Window i covers tokens [i*stride, i*stride+size); every token is
    covered; 1..size-token docs emit ONE full chunk; NULL/empty emit
    none; output is partitioning-invariant."""
    from ner_spark.functions.pack import chunk_windows

    size, stride = 8, 5
    lens = [0, 1, 7, 8, 9, 13, 14, 21, 40]
    texts = [" ".join(f"t{j}" for j in range(n)) for n in lens]
    texts.append(None)
    d = _docs(spark, texts)
    rows = chunk_windows(d, size=size, stride=stride).collect()

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r

    import math

    for i, n in enumerate(lens):
        if n == 0:
            assert i not in by_doc
            continue
        n_starts = 1 + math.ceil(max(n - size, 0) / stride)
        got = by_doc[i]
        assert sorted(got) == list(range(n_starts))
        covered = set()
        for ci in range(n_starts):
            toks = [f"t{j}" for j in range(n)][ci * stride : ci * stride + size]
            assert got[ci]["chunk_text"] == " ".join(toks)
            assert got[ci]["n_tokens"] == len(toks)
            covered.update(range(ci * stride, min(ci * stride + size, n)))
        assert covered == set(range(n))  # no token missed
    assert len(texts) - 1 not in by_doc  # NULL text: no rows

    a = sorted(map(tuple, rows))
    b = sorted(
        map(tuple, chunk_windows(d.repartition(7), size=size, stride=stride).collect())
    )
    assert a == b


def test_chunk_windows_rejects_bad_geometry(spark):
    from ner_spark.functions.pack import chunk_windows

    d = _docs(spark, ["a b c"])
    import pytest

    for size, stride in ((4, 5), (0, 1), (4, 0)):
        with pytest.raises(ValueError):
            chunk_windows(d, size=size, stride=stride)


def test_curriculum_schedule_order_and_epochs(spark):
    """Docs stream quality-descending (doc_id tie-break), each lands
    WHOLE in the epoch its offset falls in; offsets partition the
    stream exactly; bucket_size never changes the result."""
    from ner_spark.functions.pack import curriculum_schedule

    # quality differs via length band: long-enough texts score higher
    hi = "the stock rating of the company is good and the board agreed " * 3
    lo = "x y"
    docs = _docs(spark, [lo, hi, lo, hi, hi])
    out = {
        r.doc_id: (r.quality_micro, r.n_tokens, r.epoch, r.epoch_off)
        for r in curriculum_schedule(docs, budget=30).collect()
    }
    assert len(out) == 5
    # high-quality docs (1, 3, 4) must precede low-quality (0, 2)
    his = [out[i] for i in (1, 3, 4)]
    los = [out[i] for i in (0, 2)]
    assert min(q for q, *_ in his) > max(q for q, *_ in los)
    # stream offsets: doc 1 first (33 toks -> epoch 0), doc 3 at off 33
    # (epoch 1), doc 4 at off 66 (epoch 2), then doc 0, doc 2
    n_hi = his[0][1]
    assert his[0][2:] == (0, 0)
    assert out[3][2] == (n_hi * 1) // 30
    assert out[4][2] == (n_hi * 2) // 30
    assert out[0][2] <= out[2][2]  # doc_id tie-break within equal quality
    # bucket_size invariance (forces multi-bucket path)
    small = {
        r.doc_id: (r.quality_micro, r.n_tokens, r.epoch, r.epoch_off)
        for r in curriculum_schedule(docs, budget=30, bucket_size=2).collect()
    }
    assert small == out


def test_lm_topk_dirichlet_scoring(spark):
    """Hand-checked Dirichlet query likelihood: higher tf wins at equal
    length, longer docs pay the length prior, non-matching docs never
    rank, scores match a pure-Python reference bit-for-bit."""
    import math

    from ner_spark.functions.text import lm_topk

    texts = [
        "spark spark spark pad",       # doc 0: tf=3, dl=4
        "spark pad pad pad",           # doc 1: tf=1, dl=4
        "spark " + "pad " * 98 + "end",  # doc 2: tf=1, dl=100
        "no match here",               # doc 3: tf=0 -> excluded
    ]
    docs = _docs(spark, texts)
    out = {r.doc_id: r.score_micro for r in lm_topk(docs, ["spark"], k=10).collect()}
    assert 3 not in out and set(out) == {0, 1, 2}
    # python reference with identical op order
    dls = [4, 4, 100]
    total_dl = 4 + 4 + 100 + 3
    cf = 5
    mu = 2000.0
    mu_pc = mu * ((cf + 1) / (total_dl + 1))
    ref = {
        i: math.floor(1e6 * math.log((tf + mu_pc) / (dl + mu)))
        for i, tf, dl in [(0, 3.0, 4.0), (1, 1.0, 4.0), (2, 1.0, 100.0)]
    }
    assert out == ref
    assert out[0] > out[1] > out[2]
