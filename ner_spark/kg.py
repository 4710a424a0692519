"""Pure-Python KG logic spec: normalization, MinHash-LSH, relations, CC.

This module is Spark-free. It defines the *specification* the distributed
operators implement with DataFrame built-ins, and doubles as the oracle
implementation used to precompute golden fixtures. Hashing is md5-based so
the exact same integers are computable in PySpark (`F.md5` + `F.conv`) and
in DuckDB SQL — the three implementations (python / Spark / SQL) must agree
bit-for-bit, which is what the tests assert.
"""

from __future__ import annotations

import hashlib
import re

# --- mention normalization (SURVEY §2 P3 lower + our linking keys) --------

_SUFFIX_RE = re.compile(r"\s+(inc|ltd|gmbh|co)$")
_WS_RE = re.compile(r"\s+")

NORM_SUFFIX_PATTERN = r"\s+(inc|ltd|gmbh|co)$"  # shared with Spark/SQL


def normalize_surface(obj: str) -> str:
    s = _WS_RE.sub(" ", obj.lower().strip())
    s = _SUFFIX_RE.sub("", s)
    return s


# --- shingles + MinHash-LSH spec ------------------------------------------

N_HASHES = 12
BAND_ROWS = 3  # 4 bands of 3 rows
N_BANDS = N_HASHES // BAND_ROWS
JACCARD_THRESHOLD = 0.55

# MinHash = one md5 per shingle, then N_HASHES affine rehashes
# ``(a_i * h31 + b_i) mod M61`` (the classic universal-hash family).
# Hashing each shingle once and permuting arithmetically is 12x less
# digest work than md5(shingle||i) per hash index — the difference between
# one and twelve md5 passes over every shingle of 10^12 turns. Operand
# sizing keeps every intermediate inside a signed 64-bit int so Python,
# Spark SQL and DuckDB compute bit-identical values with plain BIGINT
# arithmetic: h31 < 2^31, a_i odd < 2^30, so a_i*h31 + b_i < 2^62.
MERSENNE61 = (1 << 61) - 1
H31_MASK = 0x7FFFFFFF


def _minhash_constants() -> tuple[list[int], list[int]]:
    a = [
        (int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:15], 16) & ((1 << 30) - 1)) | 1
        for i in range(N_HASHES)
    ]
    b = [
        int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:15], 16) & ((1 << 30) - 1)
        for i in range(N_HASHES)
    ]
    return a, b


MINHASH_A, MINHASH_B = _minhash_constants()


def char_shingles(s: str, k: int = 3) -> list[str]:
    """Distinct character k-grams, insertion order; whole string if short."""
    if len(s) < k:
        return [s]
    seen: dict[str, None] = {}
    for i in range(len(s) - k + 1):
        seen.setdefault(s[i : i + k], None)
    return list(seen)


def md5_hash60(s: str) -> int:
    """First 15 hex digits of md5 as an int (60 bits, fits a signed 64).

    Spark equivalent:  conv(substring(md5(s), 1, 15), 16, 10) :: long
    DuckDB equivalent: from_hex / hex-string cast of substr(md5(s), 1, 15)
    """
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def minhash_signature(shingles: list[str]) -> list[int]:
    hs = [md5_hash60(sh) & H31_MASK for sh in shingles]
    return [
        min((a * h + b) % MERSENNE61 for h in hs)
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


def band_keys(entity_type: str, sig: list[int]) -> list[str]:
    keys = []
    for b in range(N_BANDS):
        chunk = sig[b * BAND_ROWS : (b + 1) * BAND_ROWS]
        keys.append(f"{entity_type}|{b}|" + "-".join(str(x) for x in chunk))
    return keys


def jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


# --- open relation extraction rules (SURVEY §3 M2) -------------------------

# (subject type, object type) -> predicate; applied to every ordered pair of
# mentions co-occurring in one turn (subject span strictly before object span).
REL_RULES: dict[tuple[str, str], str] = {
    ("brand", "product"): "makes",
    ("product", "color"): "has_color",
    ("product", "material"): "made_of",
    ("product", "size"): "has_size",
    ("person", "org"): "affiliated_with",
    ("org", "place"): "based_in",
    ("brand", "place"): "based_in",
    ("person", "place"): "located_in",
}


def relate_mentions(
    mentions: list[tuple[str, str, int]],
) -> list[tuple[str, str, str, str, str]]:
    """mentions: [(type, text, span_start)] within one turn →
    [(subj_type, subj_text, predicate, obj_type, obj_text)]."""
    ms = sorted(mentions, key=lambda m: (m[2], m[0], m[1]))
    out = []
    # sorted by span_start, so only j > i can satisfy the strict
    # start-before-start condition — the upper triangle suffices
    for i in range(len(ms)):
        for j in range(i + 1, len(ms)):
            if ms[i][2] >= ms[j][2]:
                continue
            pred = REL_RULES.get((ms[i][0], ms[j][0]))
            if pred is not None:
                out.append((ms[i][0], ms[i][1], pred, ms[j][0], ms[j][1]))
    return out


# --- connected components (oracle: union-find; Spark: star contraction) ----


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        # iterative with full path compression: chain-shaped components
        # (normal under non-transitive similarity edges) would blow the
        # recursion limit on the 200k-edge local-solve path otherwise
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while x != root:
            nxt = self.parent[x]
            self.parent[x] = root
            x = nxt
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller string wins, matching the distributed
            # min-id convergence rule
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def connected_components(nodes: list[str], edges: list[tuple[str, str]]) -> dict[str, str]:
    uf = UnionFind()
    for n in nodes:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    # canonical member = lexicographic min of the component
    comp_min: dict[str, str] = {}
    for n in nodes:
        r = uf.find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return {n: comp_min[uf.find(n)] for n in nodes}


def node_key(entity_type: str, norm: str) -> str:
    return f"{entity_type}|{norm}"
