"""BPE merge induction (functions/bpe.py): merge-fold semantics,
determinism, and a pure-Python reference of the textbook algorithm
(invariants beyond the unrolled-DuckDB oracle hash gate)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_bpe(texts, n_merges, min_count=2):
    """Textbook reference: word histogram + non-overlapping left-to-
    right scan rewrite (the i += 2 loop), independent of both engines'
    fold formulation."""
    from collections import Counter

    hist = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: [list(w), c] for w, c in hist.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        pairs = {p: c for p, c in pairs.items() if c >= min_count}
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        for entry in words.values():
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
    return merges


def test_merge_fold_is_nonoverlapping_scan(spark):
    """The fold rewrite equals the textbook i += 2 scan on adversarial
    repeats — including odd runs and merged-token-prefix collisions."""
    from ner_spark.functions.bpe import merge_fold_expr

    cases = [
        ("aaaa", "a", "a", ["aa", "aa"]),
        ("aaa", "a", "a", ["aa", "a"]),
        ("aaaaa", "a", "a", ["aa", "aa", "a"]),
        ("abab", "a", "b", ["ab", "ab"]),
        ("baaab", "a", "a", ["b", "aa", "a", "b"]),
        ("x", "a", "a", ["x"]),
    ]
    df = spark.createDataFrame(
        [(w, list(w)) for w, *_ in cases], "word string, syms array<string>"
    )
    for word, l, r, want in cases:
        got = (
            df.where(F.col("word") == word)
            .select(F.expr(merge_fold_expr(l, r)).alias("m"))
            .collect()[0]["m"]
        )
        assert got == want, (word, l, r, got, want)


def test_multichar_merge_chain(spark):
    """Later merges operate on multi-char symbols: 'abab' learns
    (a,b) then (ab,ab); substring arithmetic stays correct when
    len(left) > 1."""
    from ner_spark.functions.bpe import bpe_merges

    texts = ["abab abab abab", "abab ab"]
    out = bpe_merges(spark, _docs(spark, texts), n_merges=3).collect()
    got = [(r["merge_rank"], r["left"], r["right"], r["pair_count"]) for r in out]
    assert got == _py_bpe(texts, 3)


def test_matches_python_reference_and_deterministic(spark):
    """Engine output == textbook reference on a mixed corpus; ties
    break (count desc, left, right); early-stop below min_count."""
    from ner_spark.functions.bpe import bpe_merges

    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "low lower lowest",
        "xy xz yz",  # all pair counts 1 after char singles — tie zone
        "q",
    ]
    want = _py_bpe(texts, 12)
    out = bpe_merges(spark, _docs(spark, texts), n_merges=12).collect()
    got = [(r["merge_rank"], r["left"], r["right"], r["pair_count"]) for r in out]
    assert got == want
    # run twice: bit-identical (no nondeterminism from shuffle order)
    out2 = bpe_merges(spark, _docs(spark, texts), n_merges=12).collect()
    assert got == [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"]) for r in out2
    ]


def _py_segments(texts, n_merges, min_count=2):
    """Apply _py_bpe's merges in rank order; returns {word: pieces}."""
    from collections import Counter

    merges = _py_bpe(texts, n_merges, min_count)
    hist = Counter(w for t in texts for w in t.split(" ") if w)
    out = {}
    for w, c in hist.items():
        syms = list(w)
        for _rank, l, r, _cnt in merges:
            nxt, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    nxt.append(l + r)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
        out[w] = (c, " ".join(syms))
    return out


def test_segments_match_python_reference(spark):
    """Train→apply chain: engine segmentation == textbook reference
    (rank-ordered merge application over the training histogram)."""
    from ner_spark.functions.bpe import bpe_segments

    texts = ["the cat sat on the mat", "the cats sat", "low lower lowest"]
    want = _py_segments(texts, 8)
    out = bpe_segments(spark, _docs(spark, texts), n_merges=8).collect()
    got = {r["word"]: (r["wcount"], r["pieces"]) for r in out}
    assert got == want


def test_segments_distributed_path_matches_driver_path(spark):
    """driver_threshold=0 forces the distributed merge loop; its final
    rewritten state (returned by bpe_learn(return_state=True), no
    second rewrite pass) must segment identically to the driver path
    and to the textbook reference."""
    from ner_spark.functions.bpe import bpe_segments

    texts = ["the cat sat on the mat", "the cats sat", "low lower lowest"]
    want = _py_segments(texts, 8)
    out = bpe_segments(
        spark, _docs(spark, texts), n_merges=8, driver_threshold=0
    ).collect()
    got = {r["word"]: (r["wcount"], r["pieces"]) for r in out}
    assert got == want


def test_oracle_sql_matches_python_reference():
    """The unrolled DuckDB oracle independently reproduces the textbook
    reference on the same corpus (so the driver gate compares two real
    implementations, not one restated twice)."""
    import duckdb

    from ner_spark.functions.bpe import bpe_oracle_sql

    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "low lower lowest",
        "xy xz yz",
        "q",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT unnest(?) AS text", [texts])
    rows = con.execute(bpe_oracle_sql(n_merges=12)).fetchall()
    got = sorted(tuple(r) for r in rows)
    assert got == sorted(_py_bpe(texts, 12))
    seg = con.execute(bpe_oracle_sql(n_merges=12, segments=True)).fetchall()
    assert {w: (c, p) for w, c, p in seg} == _py_segments(texts, 12)


def test_oracle_property_random_corpora():
    """Property: on random small corpora (including adversarial repeat
    runs like 'aaaa'), the unrolled DuckDB oracle equals the textbook
    Python reference for merges AND segmentation — the oracle chain is
    correct on arbitrary input, not just the fixtures."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ner_spark.functions.bpe import bpe_oracle_sql

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=6).map(" ".join),
        min_size=1,
        max_size=4,
    )

    @settings(max_examples=60, deadline=None)
    @given(corpus)
    def check(texts):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT unnest(?) AS text", [texts]
        )
        got = sorted(
            tuple(r) for r in con.execute(bpe_oracle_sql(n_merges=6)).fetchall()
        )
        assert got == sorted(_py_bpe(texts, 6))
        seg = con.execute(
            bpe_oracle_sql(n_merges=6, segments=True)
        ).fetchall()
        assert {w: (c, p) for w, c, p in seg} == _py_segments(texts, 6)
        con.close()

    check()


def test_unicode_cjk_merges(spark):
    """Multi-byte symbols: length()/substring() are code-point-based in
    Spark, DuckDB, and Python alike — CJK merges must agree in all
    three engines (the fold's substring arithmetic uses len(left) in
    CHARACTERS)."""
    import duckdb

    from ner_spark.functions.bpe import bpe_merges, bpe_oracle_sql

    texts = ["品牌 品牌 品质 品质 品牌", "龙龙龙 龙龙龙 商品"]
    want = _py_bpe(texts, 6)
    out = bpe_merges(spark, _docs(spark, texts), n_merges=6).collect()
    got = [(r["merge_rank"], r["left"], r["right"], r["pair_count"]) for r in out]
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT unnest(?) AS text", [texts])
    oracle = sorted(
        tuple(r) for r in con.execute(bpe_oracle_sql(n_merges=6)).fetchall()
    )
    assert oracle == sorted(want)


def test_adaptive_paths_identical(spark):
    """The driver-side loop (small-vocab fast path) and the distributed
    loop (driver_threshold=0) produce identical merge tables — the
    same both-paths-equal assertion the adaptive connected-components
    operator carries."""
    from ner_spark.functions.bpe import bpe_train, word_histogram

    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "low lower lowest",
        "aaaa aaa abab",
    ]
    words = word_histogram(_docs(spark, texts))
    fast = bpe_train(spark, words, n_merges=10).collect()
    dist = bpe_train(spark, words, n_merges=10, driver_threshold=0).collect()
    key = lambda r: (r["merge_rank"], r["left"], r["right"], r["pair_count"])
    assert [key(r) for r in fast] == [key(r) for r in dist]
    assert [key(r) for r in fast] == [
        (rk, l, r, c) for rk, l, r, c in _py_bpe(texts, 10)
    ]
