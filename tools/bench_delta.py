"""Round-over-round per-query bench delta table.

Usage:
    python tools/bench_delta.py OLD.json NEW.json [--top N]

OLD/NEW are either a full per-query record (``BENCH_full*.json``, the
complete dict bench.py persists each run) or a driver-recorded
``BENCH_r{N}.json`` (whose ``parsed`` field carries the compact summary
— headline + the heaviest queries only). Emits a GitHub-markdown table
of the N largest absolute deltas over the intersection of per-query
keys, plus the headline/throughput/scaling one-liners — the
machine-diffable regression view VERDICT r04 directive 3 asked for
(e.g. it settles "kg_link_cc 5.50 → 7.18 s: host noise or real?" with
data instead of prose).

Single-query sf0.1 timings swing 2-3x with host windows (BENCH.md's
documented spread), so the table flags only |delta| >= 30% AND >= 1 s
as "watch"; everything else is listed without judgement.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 20
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    old, new = _load(args[0]), _load(args[1])
    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn), key=lambda k: -abs(qn[k] - qo[k]))

    print(f"| query | {args[0].split('/')[-1]} | {args[1].split('/')[-1]} "
          "| delta | note |")
    print("|---|---|---|---|---|")
    for k in common[:top]:
        a, b = qo[k], qn[k]
        d = b - a
        watch = abs(d) >= 1.0 and abs(d) >= 0.3 * max(a, 1e-9)
        note = "watch" if watch and d > 0 else ("improved" if watch else "")
        print(f"| {k} | {a:.3f} | {b:.3f} | {d:+.3f} | {note} |")

    def line(label, f):
        a, b = f(old), f(new)
        if a is not None and b is not None:
            print(f"- {label}: {a} -> {b}")

    print()
    line("headline total (not comparable across surface growth)",
         lambda d: d.get("value"))
    line("n_queries", lambda d: d.get("n_queries", len(d.get("queries", {}))))
    line("kg_turns_per_sec", lambda d: d.get("kg_turns_per_sec"))
    line("kg_triples_per_sec", lambda d: d.get("kg_triples_per_sec"))
    line("scaling efficiency_n_to_4n",
         lambda d: (d.get("scaling") or {}).get("efficiency_n_to_4n"))
    line("saturated 8->32",
         lambda d: (d.get("scaling") or {}).get("efficiency_8_to_32"))


if __name__ == "__main__":
    main()
