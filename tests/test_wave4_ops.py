"""Round-4 wave-2 operators: funnel/retention, Gopher rules, text
normalization, Zipf fit, duplication profile, dialog acts, ANN recall
eval, transitive closure — hand-computable fixtures pinning the exact
semantics the DuckDB oracles restate."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

TS0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, TS0 + datetime.timedelta(seconds=s), u, t)
            for i, (u, t, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_funnel_strict_order(spark):
    """Steps count only strictly AFTER the user's earliest previous
    step; same-second and out-of-order events don't convert."""
    from ner_spark.functions.events import funnel_counts

    rows = [
        # u1 converts fully: view@0 -> click@10 -> purchase@20
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
        # u2: click BEFORE view only -> stops at view
        (2, "click", 0), (2, "view", 10),
        # u3: click at the SAME second as view -> strict > rejects
        (3, "view", 5), (3, "click", 5),
        # u4: view->click, purchase before click -> stops at click
        (4, "purchase", 0), (4, "view", 1), (4, "click", 2),
        # u5: never views
        (5, "click", 0), (5, "purchase", 1),
    ]
    out = {
        r["step"]: (r["step_idx"], r["n_users"])
        for r in funnel_counts(_ev(spark, rows), ("view", "click", "purchase")).collect()
    }
    assert out == {"view": (1, 4), "click": (2, 2), "purchase": (3, 1)}


def test_retention_cohort_offsets(spark):
    """Cohort = first active epoch-day; only requested offsets emit,
    only cells with at least one active user."""
    from ner_spark.functions.events import retention_table

    day = 86400
    rows = [
        (1, "view", 0), (1, "view", 1 * day + 5), (1, "view", 7 * day),
        (2, "view", 10), (2, "view", 3 * day + 1),
        (3, "view", 1 * day), (3, "view", 2 * day),  # cohort day 1, offset 1
    ]
    out = sorted(
        (r["cohort_day"], r["day_offset"], r["n_cohort"], r["n_active"])
        for r in retention_table(_ev(spark, rows), offsets=(1, 3, 7)).collect()
    )
    d0 = (TS0 - datetime.datetime(1970, 1, 1)).days
    assert out == [
        (d0, 1, 2, 1),   # day-0 cohort {1,2}: u1 active day 1
        (d0, 3, 2, 1),   # u2 active day 3
        (d0, 7, 2, 1),   # u1 active day 7
        (d0 + 1, 1, 1, 1),  # day-1 cohort {3}: active day 2
    ]


def test_gopher_rules_each_rule_and_empty(spark):
    from ner_spark.functions.text import gopher_rules_cols

    ok = " ".join(["the", "a"] + [f"word{i:02d}" for i in range(28)])  # 30 words
    docs = [
        (0, ok),                                   # passes all
        (1, "the a " + "w " * 8),                  # 10 words -> word_count fails
        (2, " ".join(["the", "a"] + ["xx"] * 28)),  # unique_frac fails
        (3, " ".join([f"word{i:02d}" for i in range(30)])),  # no stopwords
        (4, ""),                                   # empty: all False, not NULL
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rules = gopher_rules_cols(F.col("text"))
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *[c.alias(n) for n, c in rules.items()]).collect()
    }
    assert out[0]["pass_gopher"] is True
    assert out[1]["r_word_count"] is False
    assert out[2]["r_unique_frac"] is False
    assert out[3]["r_stopwords"] is False
    empty = out[4]
    assert empty["n_words"] == 0
    for k, v in empty.items():
        if k.startswith(("r_", "pass_")):
            assert v is False  # FALSE, never NULL


def test_normalize_strips_and_collapses(spark):
    from ner_spark.functions.text import normalize_text_col

    noisy = "\x07  he​llo \t\x1f world  "
    df = spark.createDataFrame([(noisy,)], "t string")
    out = df.select(normalize_text_col(F.col("t")).alias("c")).first()["c"]
    assert out == "hello world"


def test_zipf_slope_matches_plain_python(spark):
    """Two-term corpus with known frequencies: the quantized closed
    form equals an independent plain-Python computation."""
    from ner_spark.functions.corpus import zipf_fit

    # freqs: aa x 8, bb x 4, cc x 2, dd x 1
    text = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_fit(df, n_ranks=200).first()
    xs = [math.floor(1e6 * math.log(r)) for r in (1, 2, 3, 4)]
    ys = [math.floor(1e6 * math.log(f)) for f in (8, 4, 2, 1)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / 1e6
    assert row["n_ranks"] == 4
    assert row["slope"] == round(slope, 6)
    assert row["intercept"] == round(intercept, 6)


def test_dup_cluster_stats_sums_to_corpus(spark):
    from ner_spark.functions.dedup import dup_cluster_stats

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, base), (1, base), (2, base),            # one 3-cluster
        (3, "totally different words here entirely"),
        (4, "another unrelated document text body"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in dup_cluster_stats(df).collect()
    }
    assert out[3] == (1, 3)
    assert out[1] == (2, 2)
    assert sum(nd for _, nd in out.values()) == len(docs)


def test_dialog_acts_precedence(spark):
    from ner_spark.operators.segments import dialog_acts

    rows = [
        ("c", 0, "user", "what run sort"),        # question beats command
        ("c", 1, "user", "run the report"),       # command (first token)
        ("c", 2, "assistant", "yes the report"),  # ack
        ("c", 3, "tool", "rows returned fine"),   # tool_result
        ("c", 4, "assistant", "totals look fine"),  # statement
        ("c", 5, "user", "deploy it now?"),       # trailing ? -> question
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {r["turn_idx"]: r["act"] for r in dialog_acts(df).collect()}
    assert out == {
        0: "question", 1: "command", 2: "ack",
        3: "tool_result", 4: "statement", 5: "question",
    }


def test_ann_recall_one_cell_is_exact(spark):
    """With a single IVF cell the index degenerates to brute force, so
    recall must be exactly 1.0 — pins the eval overlay's join/count
    arithmetic."""
    from ner_spark.functions.similarity import ann_recall_eval

    vecs = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)], 0)
        for i in range(20)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    row = ann_recall_eval(
        df, df.where(F.col("vec_id") < 5), k=3, n_cells=1
    ).first()
    assert row["n_queries"] == 5
    assert row["n_hits"] == 15
    assert row["recall"] == 1.0


def test_transitive_closure_chain_and_cycle(spark):
    from ner_spark.operators.graph import transitive_closure

    edges = [
        (1, "located_in", 2, 1),
        (2, "located_in", 3, 1),
        (3, "located_in", 4, 1),
        (5, "located_in", 6, 1),
        (6, "located_in", 5, 1),   # 2-cycle: no self-pairs emitted
        (7, "makes", 8, 1),        # other predicate ignored
    ]
    df = spark.createDataFrame(
        edges, "src_entity long, pred string, dst_entity long, n_turns long"
    )
    out = sorted(
        (r["src_entity"], r["dst_entity"], r["min_hops"])
        for r in transitive_closure(df, preds=("located_in",), max_hops=10).collect()
    )
    assert out == [
        (1, 2, 1), (1, 3, 2), (1, 4, 3),
        (2, 3, 1), (2, 4, 2),
        (3, 4, 1),
        (5, 6, 1), (6, 5, 1),
    ]


# ---------------------------------------------------------------------------
# degenerate inputs: the wave-2 operators must neither crash nor emit
# NULL-typed garbage on empty/trivial frames
# ---------------------------------------------------------------------------


def test_funnel_empty_and_missing_steps(spark):
    from ner_spark.functions.events import funnel_counts

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["step"]: r["n_users"] for r in funnel_counts(empty, ("view", "click")).collect()}
    assert out == {"view": 0, "click": 0}
    # step never present in the data: later steps report 0, not error
    rows = [(1, "view", 0)]
    out2 = {
        r["step"]: r["n_users"]
        for r in funnel_counts(_ev(spark, rows), ("view", "click", "purchase")).collect()
    }
    assert out2 == {"view": 1, "click": 0, "purchase": 0}


def test_retention_empty_and_single_event(spark):
    from ner_spark.functions.events import retention_table

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string"
    )
    assert retention_table(empty).count() == 0
    # one event: cohort exists but no offset cells emit
    assert retention_table(_ev(spark, [(1, "view", 0)])).count() == 0


def test_dup_cluster_stats_no_duplicates(spark):
    from ner_spark.functions.dedup import dup_cluster_stats

    docs = [(i, f"completely unique document number {i} body text") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = [(r["cluster_size"], r["n_clusters"], r["n_docs"]) for r in dup_cluster_stats(df).collect()]
    assert out == [(1, 4, 4)]


def test_zipf_degenerate_single_term(spark):
    """One distinct term: the regression denominator is zero -> the
    division yields no finite slope; the op must not crash and must
    still report n_ranks."""
    from ner_spark.functions.corpus import zipf_fit

    df = spark.createDataFrame([(1, "aa aa aa")], "doc_id long, text string")
    row = zipf_fit(df).first()
    assert row["n_ranks"] == 1
    # zero x-variance: try_divide pins slope to NULL (DuckDB x/0 is
    # NULL too, so the two-engine gate agrees)
    assert row["slope"] is None
    assert row["intercept"] is None


def test_transitive_closure_empty_pred(spark):
    from ner_spark.operators.graph import transitive_closure

    df = spark.createDataFrame(
        [(1, "makes", 2, 1)],
        "src_entity long, pred string, dst_entity long, n_turns long",
    )
    assert transitive_closure(df, preds=("located_in",)).count() == 0


def test_normalize_identity_on_clean_text(spark):
    from ner_spark.functions.text import normalize_text_col

    df = spark.createDataFrame([("already clean text",)], "t string")
    assert df.select(normalize_text_col(F.col("t")).alias("c")).first()["c"] == "already clean text"


# ---------------------------------------------------------------------------
# seeded randomized cross-checks vs plain-Python references (different
# algorithms computing the same answer — the oracle-gate philosophy,
# in-process)
# ---------------------------------------------------------------------------


def _py_bfs_closure(edges, max_hops=10):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    nodes = set()
    for s, d in edges:
        adj[s].append(d)
        nodes.add(s)
        nodes.add(d)
    out = {}
    for src in nodes:
        dist = {src: 0}
        q = deque([src])
        while q:
            x = q.popleft()
            if dist[x] >= max_hops:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for dst, h in dist.items():
            if dst != src:
                out[(src, dst)] = h
    return out


def test_transitive_closure_random_digraphs_vs_python_bfs(spark):
    import random

    from ner_spark.operators.graph import transitive_closure

    rng = random.Random(7)
    for trial in range(3):
        n = 14
        edges = {
            (rng.randrange(n), rng.randrange(n)) for _ in range(22)
        }
        edges = {(s, d) for s, d in edges if s != d}
        df = spark.createDataFrame(
            [(s, "located_in", d, 1) for s, d in edges],
            "src_entity long, pred string, dst_entity long, n_turns long",
        )
        got = {
            (r["src_entity"], r["dst_entity"]): r["min_hops"]
            for r in transitive_closure(df, preds=("located_in",), max_hops=10).collect()
        }
        assert got == _py_bfs_closure(edges), f"trial {trial}"


def test_funnel_random_logs_vs_python(spark):
    import random

    from ner_spark.functions.events import funnel_counts

    rng = random.Random(11)
    steps = ("view", "click", "purchase")
    rows = [
        (rng.randrange(8), rng.choice(steps + ("error",)), rng.randrange(2000))
        for _ in range(120)
    ]
    # python reference: per user, greedy earliest strictly-increasing chain
    by_user = {}
    for u, t, s in rows:
        by_user.setdefault(u, []).append((s, t))
    counts = [0, 0, 0]
    for evs in by_user.values():
        prev = None
        for i, step in enumerate(steps):
            cand = [
                s for s, t in evs
                if t == step and (prev is None or s > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(_ev(spark, rows), steps).collect()
    }
    assert [got[s] for s in steps] == counts
    # monotone: conversion never increases down the funnel
    assert counts[0] >= counts[1] >= counts[2]


def test_retention_bounds_random(spark):
    import random

    from ner_spark.functions.events import retention_table

    rng = random.Random(13)
    rows = [
        (rng.randrange(10), "view", rng.randrange(12) * 86400 + rng.randrange(86400))
        for _ in range(150)
    ]
    out = retention_table(_ev(spark, rows), offsets=(1, 3, 7)).collect()
    assert out, "random log dense enough to produce cells"
    for r in out:
        assert 1 <= r["n_active"] <= r["n_cohort"]
        assert r["day_offset"] in (1, 3, 7)


# ---------------------------------------------------------------------------
# wave 3 (round-5 window pool): heaps fit, subject completeness, split
# leakage, event anomalies, rank agreement
# ---------------------------------------------------------------------------


def test_heaps_fit_matches_plain_python(spark):
    """4-doc corpus, 8 prefixes: prefix (N, V) points and the quantized
    fit both equal an independent python computation."""
    from ner_spark.functions.corpus import heaps_fit

    docs = [
        (0, "a b c"),
        (1, "a b d d"),
        (2, "e f"),
        (3, "a g g g"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = heaps_fit(df, n_points=8).first()

    # python reference: same prefix rule (doc_id < ceil(D*j/8))
    toks = {i: t.split() for i, t in docs}
    D = 4
    pts = []
    for j in range(1, 9):
        cut = -(-D * j // 8)
        pref = [i for i in toks if i < cut]
        N = sum(len(toks[i]) for i in pref)
        V = len({w for i in pref for w in toks[i]})
        if N > 0 and V > 0:
            pts.append((N, V))
    xs = [math.floor(1e6 * math.log(n)) for n, _ in pts]
    ys = [math.floor(1e6 * math.log(v)) for _, v in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / 1e6
    assert row["n_points"] == n
    assert row["slope"] == round(slope, 6)
    assert row["intercept"] == round(intercept, 6)


def test_subject_completeness_majority_rule(spark):
    """Type 'org': 2 of 3 subjects assert 'makes' (67% >= 50% ->
    expected); the third gets a missing-fact row. A 1-of-3 predicate
    (33%) is not expected. Object-only entities emit nothing."""
    from ner_spark.operators.graph import subject_completeness

    nodes = spark.createDataFrame(
        [(1, "org"), (2, "org"), (3, "org"), (4, "place"), (9, "org")],
        "entity_id long, entity_type string",
    )
    edges = spark.createDataFrame(
        [
            (1, "makes", 4, 1),
            (2, "makes", 4, 1),
            (3, "based_in", 4, 1),   # subject, but lacks 'makes'
            (1, "rare_pred", 4, 1),  # 1/3 -> not expected
            # entity 9 never a subject -> excluded entirely
        ],
        "src_entity long, pred string, dst_entity long, n_turns long",
    )
    out = sorted(
        (r["entity_id"], r["pred"])
        for r in subject_completeness(nodes, edges, min_share_pct=50).collect()
    )
    # 'makes' expected for org (2/3); missing for subject 3.
    # 'based_in' is 1/3 -> not expected; 'rare_pred' 1/3 -> not expected.
    assert out == [(3, "makes")]


def test_split_leakage_only_cross_pairs(spark):
    from ner_spark.functions.datasets import split_assign_col
    from ner_spark.functions.dedup import split_leakage

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # find two ids on opposite split sides and two on the same side
    probe = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    ).select("doc_id", split_assign_col(F.col("doc_id")).alias("s"))
    sides = {r["doc_id"]: r["s"] for r in probe.collect()}
    train_ids = [i for i, s in sides.items() if s == "train"]
    val_ids = [i for i, s in sides.items() if s == "val"]
    assert len(train_ids) >= 2 and len(val_ids) >= 1
    docs = [
        (train_ids[0], base),
        (train_ids[1], base),   # same-side near-dup: NOT leakage
        (val_ids[0], base),     # cross-side near-dup: leakage
        (train_ids[2] if len(train_ids) > 2 else train_ids[0] + 1000,
         "totally unrelated words entirely different content"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = [
        (r["id_a"], r["id_b"], r["split_a"], r["split_b"])
        for r in split_leakage(df).collect()
    ]
    assert len(out) == 2  # val doc pairs with each of the two train copies
    for _a, _b, sa, sb in out:
        assert {sa, sb} == {"train", "val"}


def test_event_anomaly_rational_threshold(spark):
    from ner_spark.functions.events import event_anomaly_days

    day = 86400
    # type 'x': days 0..3 with counts 3,3,3,7 -> total 16, n_days 4,
    # mean 4; 9/8 threshold: flag iff 8*n*4 > 9*16 <=> n > 4.5 -> day 3
    rows = []
    for d, c in enumerate([3, 3, 3, 7]):
        rows += [(1, "x", d * day + k) for k in range(c)]
    out = [
        (r["event_type"], r["day"], r["n_events"])
        for r in event_anomaly_days(_ev(spark, rows)).collect()
    ]
    d0 = (TS0 - datetime.datetime(1970, 1, 1)).days
    assert out == [("x", d0 + 3, 7)]


def test_rank_agreement_tau_one_when_scores_monotone(spark):
    """Single-term query over equal-length docs: both BM25 and QL rank
    by tf, so the two top-k lists agree pairwise -> tau = 1.0."""
    from ner_spark.functions.text import rank_agreement

    docs = []
    for i in range(12):
        tf = i + 1
        fill = 20 - tf
        docs.append(
            (i, " ".join(["apple"] * tf + [f"pad{i}w{j}" for j in range(fill)]))
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = rank_agreement(df, ["apple"], k=5).first()
    assert row["n_common"] == 5
    assert row["discordant"] == 0
    assert row["tau"] == 1.0


def test_chunk_dedup_flags_repeated_passages(spark):
    """Docs sharing a 32-token block flag those chunk positions; the
    unique remainder chunks don't. An intra-doc repeat also counts."""
    from ner_spark.functions.dedup import chunk_dedup

    block = " ".join(f"b{i}" for i in range(32))
    uniq1 = " ".join(f"u{i}" for i in range(32))
    uniq2 = " ".join(f"v{i}" for i in range(32))
    docs = [
        (0, block + " " + uniq1),          # chunk0 = block, chunk1 = uniq1
        (1, block + " " + uniq2),          # chunk0 = block
        (2, block + " " + block),          # intra-doc repeat: both chunks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_occurrences"])
        for r in chunk_dedup(df, size=32).collect()
    )
    assert out == [(0, 0, 4), (1, 0, 4), (2, 0, 4), (2, 1, 4)]


def test_vocab_coverage_counts(spark):
    from ner_spark.functions.corpus import vocab_coverage

    source = spark.createDataFrame(
        [(0, "alpha beta gamma")], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [
            ("user", "alpha delta"),        # 1 of 2 OOV
            ("user", "beta gamma"),         # 0 of 2
            ("tool", "zeta eta theta"),     # 3 of 3
        ],
        "role string, text string",
    )
    out = {
        r["role"]: (r["n_tokens"], r["n_oov"], r["oov_micro"])
        for r in vocab_coverage(target, source).collect()
    }
    assert out == {"user": (4, 1, 250000), "tool": (3, 3, 1000000)}


def test_mmr_prefers_diverse_over_redundant(spark):
    """Candidates: A and B near-identical (both high relevance), C
    orthogonal with lower relevance. Top-2 by relevance is {A, B};
    MMR's second pick must be C (B's similarity to the already-picked
    A erases its head start)."""
    from ner_spark.functions.similarity import mmr_rerank

    q = [1.0, 0.0, 0.0, 0.1]
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.99, 0.01, 0.0, 0.0]
    c = [0.3, 1.0, 0.0, 0.0]   # mild relevance keeps C in the shortlist
    rows = [(0, q, 0), (1, a, 0), (2, b, 0), (3, c, 0)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = sorted(
        (r["rank"], r["neighbor_id"])
        for r in mmr_rerank(
            df, df.where(F.col("vec_id") == 0), k=2, shortlist=3
        ).collect()
    )
    assert out[0] == (1, 1)   # rank 1 = argmax relevance (A)
    assert out[1] == (2, 3)   # rank 2 = diverse C, not near-copy B


def test_lsh_recall_eval_exact_dups_fully_recalled(spark):
    """Identical docs share identical signatures, so every truth pair
    collides in every band: recall must be exactly 1.0."""
    from ner_spark.functions.dedup import lsh_recall_eval

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [(0, base), (1, base), (2, base),
            (3, "entirely different other words body text here now")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = lsh_recall_eval(df, sample_max_id=10).first()
    assert row["n_truth"] == 3       # the 3 pairs among {0,1,2}
    assert row["n_candidates"] == 3
    assert row["recall"] == 1.0


def test_lsh_recall_eval_banding_floor_on_corpus(spark):
    """FLOOR GATE on the measured banding recall over the real corpus:
    every hash gate would stay green if a banding change (band count,
    rows-per-band, signature length) silently gutted dedup coverage —
    the oracle restates whatever the banding produces. Pin the
    deterministic sf0.001 measurement (recall 25/28 = 0.892857) so a
    coverage regression fails CI: n_truth pins the ground-truth arm
    (shingle/threshold semantics), the floor pins the banding's recall
    with no slack needed — the input and hashes are deterministic."""
    from ner_spark.functions.dedup import lsh_recall_eval

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = lsh_recall_eval(d).first()
    assert row["n_truth"] == 28
    assert row["recall"] >= 0.89


def test_pmi_collocations_prefers_exclusive_pairs(spark):
    """'aa bb' always co-occur exclusively (PMI high); 'cc dd' co-occur
    but cc/dd also appear alone (PMI lower). Floored-log spec pinned
    against plain python."""
    from ner_spark.functions.corpus import pmi_collocations

    docs = (
        [(i, "aa bb") for i in range(6)]
        + [(10 + i, "cc dd") for i in range(6)]
        + [(20 + i, "cc xx dd yy") for i in range(6)]
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi_micro"])
        for r in pmi_collocations(df, min_count=5, k=20).collect()
    }
    assert ("aa", "bb") in out and ("cc", "dd") in out
    # plain-python floored-log reference for (aa, bb):
    n_pair, n_bi = 6, 6 + 6 + 18  # per-doc bigrams: 1, 1, 3
    u_aa = u_bb = 6
    n_uni = 12 + 12 + 24
    ref = (
        math.floor(1e6 * math.log(n_pair))
        - math.floor(1e6 * math.log(n_bi))
        - math.floor(1e6 * math.log(u_aa))
        - math.floor(1e6 * math.log(u_bb))
        + 2 * math.floor(1e6 * math.log(n_uni))
    )
    assert out[("aa", "bb")] == (6, ref)
    assert out[("aa", "bb")][1] > out[("cc", "dd")][1]


def test_session_funnel_counts_sittings_not_users(spark):
    """One user, two sessions: full conversion in session 1, view-only
    in session 2 — and a cross-session click that must NOT convert."""
    from ner_spark.functions.events import session_funnel

    rows = [
        (1, "view", 0), (1, "click", 60), (1, "purchase", 120),  # session 1
        (1, "view", 10_000),                                     # session 2
        (2, "view", 0), (2, "click", 10_000),  # u2: click in LATER session
    ]
    out = {
        r["step"]: r["n_sessions"]
        for r in session_funnel(_ev(spark, rows), ("view", "click", "purchase")).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_json_props_stats_exact_ints(spark):
    rows = [
        (0, TS0, 1, "view", '{"k": 5}'),
        (1, TS0, 1, "view", '{"k": 7}'),
        (2, TS0, 2, "click", '{"k": -3}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, props string"
    )
    from ner_spark.entry_queries import QUERIES  # reuse the query body via module fn
    k = F.get_json_object("props", "$.k").cast("long")
    out = {
        r["event_type"]: (r["n"], r["mn"], r["mx"], r["sm"])
        for r in df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(k).alias("mn"),
            F.max(k).alias("mx"),
            F.sum(k).alias("sm"),
        )
        .collect()
    }
    assert out == {"view": (2, 5, 7, 12), "click": (1, -3, -3, -3)}


def test_event_pivot_missing_types_are_zero(spark):
    from ner_spark.entry_queries import _PIVOT_TYPES

    rows = [(1, "view", 0), (1, "view", 1), (1, "click", 2), (2, "error", 0)]
    df = _ev(spark, rows)
    wide = (
        df.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[
                F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
                for t in _PIVOT_TYPES
            ],
        )
    )
    out = {r["user_id"]: (r["n_view"], r["n_click"], r["n_error"], r["n_purchase"]) for r in wide.collect()}
    assert out == {1: (2, 1, 0, 0), 2: (0, 0, 1, 0)}


def test_rollup_subtotals_and_grouping_id(spark):
    rows = [("O", "1-URGENT", 10.0), ("O", "2-HIGH", 20.0), ("F", "1-URGENT", 5.0)]
    df = spark.createDataFrame(
        rows, "o_orderstatus string, o_orderpriority string, o_totalprice double"
    )
    out = (
        df.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().cast("int").alias("gid"), F.count(F.lit(1)).alias("n"))
        .select(
            "gid",
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("s"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("p"),
            "n",
        )
        .collect()
    )
    cells = {(r["gid"], r["s"], r["p"]): r["n"] for r in out}
    assert cells[(0, "O", "1-URGENT")] == 1
    assert cells[(1, "O", "ALL")] == 2      # status subtotal
    assert cells[(1, "F", "ALL")] == 1
    assert cells[(3, "ALL", "ALL")] == 3    # grand total
    # 3 detail rows + 2 status subtotals + 1 grand total
    assert len(cells) == 6
