"""Deterministic synthetic `transcripts` table generator.

Exact `input_hint` shape (BASELINE.json): one row per turn of a multi-turn
conversation — (conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp). Pure function of (seed, n_turns): byte-stable
across runs, no wall clock, no external data (FIXTURES.md F1).

Skew: `conv-000000` is hot and owns ~30% of all turns, exercising the
salting / AQE-skew path the north_star requires. Rows are emitted in a
seeded scrambled global order so stable turn ordering must be recovered via
Window.partitionBy(conv_id).orderBy(turn_idx) — the Spark restatement of
the reference's implicit line-number ordering (/root/reference/utils.py:45,
SURVEY §2 O5).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ner_spark.fixtures.gazetteer import FILLER, ORG_SUFFIXES, all_surfaces

SEED = 42
HOT_FRACTION = 0.30
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "browser", "calculator", "db_query", "code_run"]
BASE_EPOCH = pd.Timestamp("2026-01-01T00:00:00Z").tz_convert(None)


def _conv_hash_hours(conv_id: str) -> int:
    return int.from_bytes(hashlib.md5(conv_id.encode()).digest()[:4], "little") % 720


def _mention_tokens(rng: np.random.RandomState, surfaces) -> list[str]:
    """One mention occurrence: a gazetteer surface with seeded variation
    (casing, optional legal suffix) so linking has non-trivial clusters."""
    t, surf = surfaces[rng.randint(len(surfaces))]
    toks = list(surf)
    style = rng.randint(4)
    if style == 1:
        toks = [w.capitalize() for w in toks]
    elif style == 2:
        toks = [w.upper() if len(w) <= 4 else w.capitalize() for w in toks]
    if t in ("org", "brand") and rng.random_sample() < 0.35:
        sfx = ORG_SUFFIXES[rng.randint(len(ORG_SUFFIXES))]
        toks = toks + [sfx if style == 0 else sfx.capitalize()]
    return toks


def generate_transcripts(n_turns: int, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    surfaces = all_surfaces()
    filler = np.array(FILLER)

    hot_turns = int(n_turns * HOT_FRACTION)
    rest = n_turns - hot_turns
    conv_sizes: list[int] = [hot_turns]
    while rest > 0:
        k = int(rng.randint(4, 13))
        k = min(k, rest)
        conv_sizes.append(k)
        rest -= k

    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": [], "ts": []}
    for ci, size in enumerate(conv_sizes):
        conv_id = f"conv-{ci:06d}"
        base_ts = BASE_EPOCH + pd.Timedelta(hours=_conv_hash_hours(conv_id))
        for ti in range(size):
            role = ROLES[ti % 3]
            n_fill = int(rng.randint(5, 26))
            toks = list(filler[rng.randint(0, len(filler), n_fill)])
            n_mentions = int(rng.choice([0, 1, 1, 2, 2, 3]))
            for _ in range(n_mentions):
                pos = int(rng.randint(0, len(toks) + 1))
                toks[pos:pos] = _mention_tokens(rng, surfaces)
            rows["conv_id"].append(conv_id)
            rows["turn_idx"].append(ti)
            rows["role"].append(role)
            rows["text"].append(" ".join(toks))
            rows["tool"].append(TOOLS[ti % len(TOOLS)] if role == "tool" else None)
            rows["ts"].append(base_ts + pd.Timedelta(minutes=ti))

    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # microsecond precision: Spark cannot read parquet TIMESTAMP(NANOS)
    df["ts"] = df["ts"].astype("datetime64[us]")
    # scrambled global order (stable permutation of the same RNG stream)
    perm = rng.permutation(len(df))
    df = df.iloc[perm].reset_index(drop=True)
    return df


# sf directory basename -> target turn count (ballpark: reference corpus is
# 10k train / 2k test lines — /root/reference/data/; sf0.01 matches it).
SF_TURNS = {"sf0.001": 900, "sf0.01": 9_000, "sf0.1": 90_000}


def turns_for_sf(sf_name: str) -> int:
    return SF_TURNS.get(sf_name, 9_000)


# ---------------------------------------------------------------------------
# clustered embeddings (ANN recall evidence)
# ---------------------------------------------------------------------------

CLUSTER_SEED = 20260817


def generate_clustered_embeddings(
    n: int = 2000,
    dim: int = 64,
    n_blobs: int = 16,
    sigma: float = 0.15,
    seed: int = CLUSTER_SEED,
) -> pd.DataFrame:
    """Deterministic Gaussian-blob embeddings: ``n_blobs`` seeded unit
    centers, each point = center + sigma*noise, re-normalized.

    The driver-generated embeddings table is near-uniform on the sphere —
    the regime where NO coarse quantizer can beat random cells, so an IVF
    recall sweep on it cannot show trained centroids earning their cost
    (BENCH_r02: kmeans 0.528 <= seed 0.540). Real text/image embedding
    corpora are heavily clustered; this fixture is the deterministic
    stand-in that lets the bench demonstrate the k-means + nprobe recall
    path on clustered geometry. Pure function of its arguments — no wall
    clock, byte-stable across runs. Columns: (vec_id, embedding, blob);
    blob assignment is iid-random per point, so vec_id order carries no
    blob structure (seed_centroids' first-n rows are a fair random init).
    """
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_blobs, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    blob = rng.randint(0, n_blobs, size=n)
    pts = centers[blob] + sigma * rng.randn(n, dim)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts = pts.astype(np.float32)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [pts[i] for i in range(n)],
            "blob": blob.astype(np.int32),
        }
    )
