"""Golden-fixture builder: runs the plain-Python oracle end-to-end and
materializes parquet goldens under ``<repo>/.fixtures/<sf>/``.

The oracle path here is deliberately *independent* of the Spark operators:
row-wise Viterbi (ner_spark.oracle.reference.viterbi_decode) instead of the
batched kernel, per-row extraction instead of the pandas UDF, union-find
instead of star-contraction. The driver's DuckDB oracle reads these goldens
with read_parquet(), so CORRECTNESS_r{N}.json value-hash matches are exact
cross-implementation checks (SURVEY §5.2).

Everything is a pure function of (seed, sf); builds are atomic (tmp dir +
os.replace) and versioned so stale goldens regenerate automatically.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ner_spark import kg
from ner_spark.fixtures.generator import SEED, generate_transcripts, turns_for_sf
from ner_spark.model.tagger import TAG_NAMES, token_logits_batch, transitions
from ner_spark.oracle.reference import (
    extract_bio,
    extract_bioes,
    join_tokens,
    viterbi_decode,
)

FIXTURE_VERSION = "v14"
FIXTURES_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".fixtures")

NOISE_RATE = 0.12


def fixtures_dir(sf_name: str) -> str:
    return os.path.join(FIXTURES_ROOT, sf_name)


def _mention_spans(tags: list[str], words: list[str]):
    """extract_bio with span positions, WITHOUT set-dedup: one row per
    emitted mention in emission order. The deduped (type, text) projection
    of this equals extract_bio exactly (asserted in tests)."""
    out = []
    run: list[str] = []
    run_start = -1
    prev = "O"

    def flush(upto: int):
        nonlocal run, run_start
        if run:
            out.append((prev[2:], join_tokens(run), run_start, upto))
        run = []
        run_start = -1

    for i, tag in enumerate(tags):
        if tag == "O":
            flush(i)
        elif tag[0] == "B":
            flush(i)
            run = [words[i]]
            run_start = i
        elif tag[0] == "I":
            if prev[0] == "O" or prev[2:] != tag[2:]:
                flush(i)
            else:
                if not run:
                    run_start = i
                run.append(words[i])
        prev = tag
    flush(len(tags))
    return out


def bio_to_spans(tags: list[str]):
    """Span view of a BIO sequence (start, end, type) — same accumulation
    semantics as _mention_spans but positions only."""
    return [(s, e, t) for (t, _txt, s, e) in _mention_spans(tags, [""] * len(tags))]


def spans_to_bioes(spans, length: int):
    bio = ["O"] * length
    attr = ["null"] * length
    for s, e, t in spans:
        if e - s == 1:
            bio[s] = "S"
        else:
            bio[s] = "B"
            bio[e - 1] = "E"
            for i in range(s + 1, e - 1):
                bio[i] = "I"
        for i in range(s, e):
            attr[i] = t
    return bio, attr


def _perturb(rng: np.random.RandomState, labels: list[str], vocab: list[str]) -> list[str]:
    out = list(labels)
    for i in range(len(out)):
        if rng.random_sample() < NOISE_RATE:
            out[i] = vocab[rng.randint(len(vocab))]
    return out


def _write(df: pd.DataFrame, path: str, schema: pa.Schema | None = None):
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, path)


def build_fixtures(sf_name: str, full: bool = True, force: bool = False) -> str:
    """Idempotent build; returns the fixture directory for sf_name."""
    out_dir = fixtures_dir(sf_name)
    marker = os.path.join(out_dir, "_VERSION")
    want = f"{FIXTURE_VERSION}|seed={SEED}|full={full}"
    if not force and os.path.exists(marker):
        with open(marker) as f:
            have = f.read().strip()
        if have == want or (have.endswith("full=True") and not full):
            return out_dir

    os.makedirs(FIXTURES_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{sf_name}-", dir=FIXTURES_ROOT)
    try:
        _build_into(tmp, sf_name, full)
        with open(os.path.join(tmp, "_VERSION"), "w") as f:
            f.write(want)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def _build_into(out_dir: str, sf_name: str, full: bool) -> None:
    tdf = generate_transcripts(turns_for_sf(sf_name))
    _write(tdf, os.path.join(out_dir, "transcripts.parquet"))
    if not full:
        return

    # deterministic processing order for goldens
    o = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    token_lists = [t.split(" ") for t in o["text"]]
    trans = transitions()

    # --- reference tags: row-wise oracle decode -------------------------
    all_tags: list[list[str]] = []
    for toks in token_lists:
        unary = token_logits_batch([toks])[0]
        path = viterbi_decode(unary, trans)
        all_tags.append([TAG_NAMES[i] for i in path])
    tags_df = pd.DataFrame(
        {
            "conv_id": o["conv_id"],
            "turn_idx": o["turn_idx"],
            "tags": all_tags,
        }
    )
    _write(tags_df, os.path.join(out_dir, "reference_tags.parquet"))

    # --- mentions (with spans, no dedup) + triples (deduped set) --------
    m_rows, t_rows = [], []
    span_rows = []
    for (conv, ti, toks, tags) in zip(o["conv_id"], o["turn_idx"], token_lists, all_tags):
        spans = _mention_spans(tags, toks)
        for k, (typ, txt, s, e) in enumerate(spans):
            m_rows.append((conv, int(ti), k, typ, txt, s, e))
        pairs = extract_bio(tags, toks)
        subj = f"{conv}#{int(ti)}"
        for typ, txt in sorted(pairs):
            t_rows.append((conv, int(ti), subj, typ, txt))
        span_rows.append(
            (conv, int(ti), [{"index": list(range(s, e)), "type": typ} for typ, _x, s, e in spans])
        )
    mentions_df = pd.DataFrame(
        m_rows, columns=["conv_id", "turn_idx", "mention_idx", "pred", "obj", "span_start", "span_end"]
    )
    _write(mentions_df, os.path.join(out_dir, "reference_mentions.parquet"))
    triples_df = pd.DataFrame(t_rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"])
    _write(triples_df, os.path.join(out_dir, "reference_triples.parquet"))

    # --- alternative source encodings of the same corpus ------------------
    # S3 combined TSV (text \t labels — /root/reference/torch_version/
    # data_tools.py:23-44, data/resume-zh-one/train.csv format)
    with open(os.path.join(out_dir, "corpus.tsv"), "w", encoding="utf-8") as f:
        for toks, tags in zip(token_lists, all_tags):
            f.write(" ".join(toks) + "\t" + " ".join(tags) + "\n")

    # S4 nested JSON-lines (resume-zh corpus shape {sentence, ner} —
    # /root/reference/data_process.ipynb cell-2/3)
    import json as _json

    with open(os.path.join(out_dir, "corpus.jsonl"), "w", encoding="utf-8") as f:
        for (conv, ti, ner), toks in zip(span_rows, token_lists):
            f.write(
                _json.dumps(
                    {
                        "conv_id": conv,
                        "turn_idx": int(ti),
                        "sentence": toks,
                        "ner": ner,
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )

    spans_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            (
                "ner",
                pa.list_(
                    pa.struct([("index", pa.list_(pa.int32())), ("type", pa.string())])
                ),
            ),
        ]
    )
    gold_spans_df = pd.DataFrame(span_rows, columns=["conv_id", "turn_idx", "ner"])
    _write(gold_spans_df, os.path.join(out_dir, "gold_spans.parquet"), spans_schema)

    # exploded per-position BIO labels (oracle for the span→BIO projection,
    # /root/reference/data_process.ipynb cell-7 semantics)
    gb_rows = []
    for (conv, ti, toks, tags) in zip(o["conv_id"], o["turn_idx"], token_lists, all_tags):
        spans = _mention_spans(tags, toks)
        labels = ["O"] * len(toks)
        for typ, _x, s, e in spans:
            labels[s] = f"B-{typ}"
            for i in range(s + 1, e):
                labels[i] = f"I-{typ}"
        for pos, lab in enumerate(labels):
            gb_rows.append((conv, int(ti), pos, lab))
    _write(
        pd.DataFrame(gb_rows, columns=["conv_id", "turn_idx", "pos", "label"]),
        os.path.join(out_dir, "gold_bio.parquet"),
    )

    # --- noisy tags (corner-case-rich) + their oracle extraction --------
    rng = np.random.RandomState(SEED + 1)
    noisy_tags = [_perturb(rng, tags, TAG_NAMES) for tags in all_tags]
    _write(
        pd.DataFrame({"conv_id": o["conv_id"], "turn_idx": o["turn_idx"], "tags": noisy_tags}),
        os.path.join(out_dir, "noisy_tags.parquet"),
    )
    nt_rows = []
    for (conv, ti, toks, tags) in zip(o["conv_id"], o["turn_idx"], token_lists, noisy_tags):
        for typ, txt in sorted(extract_bio(tags, toks)):
            nt_rows.append((conv, int(ti), f"{conv}#{int(ti)}", typ, txt))
    _write(
        pd.DataFrame(nt_rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"]),
        os.path.join(out_dir, "noisy_triples.parquet"),
    )

    # micro P/R/F1 of the noisy extraction vs the clean reference pairs
    # (the A1 gate arithmetic, /root/reference/utils.py:613-634), one row
    gold_by_turn: dict[tuple[str, int], set] = {}
    for (conv, ti, _s, typ, txt) in t_rows:
        gold_by_turn.setdefault((conv, ti), set()).add((typ, txt))
    pred_by_turn: dict[tuple[str, int], set] = {}
    for (conv, ti, _s, typ, txt) in nt_rows:
        pred_by_turn.setdefault((conv, ti), set()).add((typ, txt))
    n_pred = sum(len(v) for v in pred_by_turn.values())
    n_gold = sum(len(v) for v in gold_by_turn.values())
    n_hit = sum(
        len(v & gold_by_turn.get(k, set())) for k, v in pred_by_turn.items()
    )
    p = n_hit / n_pred if n_pred else 0.0
    r = n_hit / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    _write(
        pd.DataFrame(
            [
                {
                    "n_pred": n_pred,
                    "n_gold": n_gold,
                    "n_hit": n_hit,
                    "precision_": round(p, 6),
                    "recall_": round(r, 6),
                    "f1": round(f1, 6),
                }
            ]
        ),
        os.path.join(out_dir, "kg_prf.parquet"),
    )

    # --- BIOES variant: converted + perturbed + oracle extraction -------
    bioes_rows = []
    bp_rows = []
    rng2 = np.random.RandomState(SEED + 2)
    for (conv, ti, toks, tags) in zip(o["conv_id"], o["turn_idx"], token_lists, all_tags):
        spans = bio_to_spans(tags)
        bio, attr = spans_to_bioes(spans, len(toks))
        bio = _perturb(rng2, bio, ["O", "B", "I", "E", "S"])
        bioes_rows.append((conv, int(ti), bio, attr))
        for typ, txt in sorted(extract_bioes(bio, toks, attr)):
            bp_rows.append((conv, int(ti), typ, txt))
    _write(
        pd.DataFrame(bioes_rows, columns=["conv_id", "turn_idx", "bio", "attr"]),
        os.path.join(out_dir, "bioes_tags.parquet"),
    )
    _write(
        pd.DataFrame(bp_rows, columns=["conv_id", "turn_idx", "pred", "obj"]),
        os.path.join(out_dir, "bioes_pairs.parquet"),
    )

    # --- relations (open RE oracle) --------------------------------------
    r_rows = []
    by_turn: dict[tuple[str, int], list[tuple[str, str, int]]] = {}
    for conv, ti, _k, typ, txt, s, _e in m_rows:
        by_turn.setdefault((conv, ti), []).append((typ, txt, s))
    for (conv, ti), ms in by_turn.items():
        for st, sx, pred, ot, ox in kg.relate_mentions(ms):
            r_rows.append((conv, ti, st, sx, pred, ot, ox))
    rel_df = pd.DataFrame(
        r_rows,
        columns=["conv_id", "turn_idx", "subj_type", "subj", "pred", "obj_type", "obj"],
    ).drop_duplicates()
    _write(
        rel_df.sort_values(list(rel_df.columns)).reset_index(drop=True),
        os.path.join(out_dir, "reference_relations.parquet"),
    )

    # --- entity linking + canonicalization oracle ------------------------
    # nodes = distinct (type, normalized surface)
    nodes = sorted(
        {kg.node_key(typ, kg.normalize_surface(txt)) for (_c, _t, _k, typ, txt, _s, _e) in m_rows}
    )
    norm_of = {n: n.split("|", 1)[1] for n in nodes}
    typ_of = {n: n.split("|", 1)[0] for n in nodes}
    sh_of = {n: kg.char_shingles(norm_of[n]) for n in nodes}
    # LSH banding candidates
    buckets: dict[str, list[str]] = {}
    for n in nodes:
        sig = kg.minhash_signature(sh_of[n])
        for bk in kg.band_keys(typ_of[n], sig):
            buckets.setdefault(bk, []).append(n)
    cand = set()
    for members in buckets.values():
        members = sorted(set(members))
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    edges = [
        (a, b)
        for (a, b) in sorted(cand)
        if kg.jaccard(sh_of[a], sh_of[b]) >= kg.JACCARD_THRESHOLD
    ]
    _write(
        pd.DataFrame(edges, columns=["src", "dst"]),
        os.path.join(out_dir, "link_edges.parquet"),
    )
    cmap = kg.connected_components(nodes, edges)
    _write(
        pd.DataFrame(sorted(cmap.items()), columns=["node", "canonical"]),
        os.path.join(out_dir, "canonical_map.parquet"),
    )

    # --- graph materialization oracle ------------------------------------
    # node stats: mentions per canonical entity
    ment_nodes = [
        kg.node_key(typ, kg.normalize_surface(txt)) for (_c, _t, _k, typ, txt, _s, _e) in m_rows
    ]
    node_counts: dict[str, int] = {}
    for n in ment_nodes:
        c = cmap[n]
        node_counts[c] = node_counts.get(c, 0) + 1
    member_counts: dict[str, int] = {}
    for n in nodes:
        member_counts[cmap[n]] = member_counts.get(cmap[n], 0) + 1
    nodes_df = pd.DataFrame(
        [
            (c, c.split("|", 1)[0], c.split("|", 1)[1], member_counts[c], node_counts[c])
            for c in sorted(member_counts)
        ],
        columns=["entity_id", "entity_type", "canonical_name", "n_surfaces", "n_mentions"],
    )
    _write(nodes_df, os.path.join(out_dir, "nodes.parquet"))

    # edges: relations rewritten to canonical entities; weight = number
    # of DISTINCT TURNS asserting the canonical edge (surface variants in
    # one turn collapse to one count)
    e_turns: dict[tuple[str, str, str], set] = {}
    for (conv, ti, st, sx, pred, ot, ox) in rel_df.itertuples(index=False):
        s_id = cmap[kg.node_key(st, kg.normalize_surface(sx))]
        o_id = cmap[kg.node_key(ot, kg.normalize_surface(ox))]
        e_turns.setdefault((s_id, pred, o_id), set()).add((conv, ti))
    edges_df = pd.DataFrame(
        [(s, p, t, len(v)) for (s, p, t), v in sorted(e_turns.items())],
        columns=["src_entity", "pred", "dst_entity", "n_turns"],
    )
    _write(edges_df, os.path.join(out_dir, "edges.parquet"))

    # canonical triples: every mention-level relation rewritten to the
    # canonical entity ids of its endpoints, distinct per (turn, triple)
    ct = {
        (
            conv,
            int(ti),
            cmap[kg.node_key(st, kg.normalize_surface(sx))],
            pred,
            cmap[kg.node_key(ot, kg.normalize_surface(ox))],
        )
        for (conv, ti, st, sx, pred, ot, ox) in rel_df.itertuples(index=False)
    }
    _write(
        pd.DataFrame(
            sorted(ct), columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
        ),
        os.path.join(out_dir, "canonical_triples.parquet"),
    )
