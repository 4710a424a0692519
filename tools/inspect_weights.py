#!/usr/bin/env python
"""Model-artifact introspection — the counterpart of the reference's
checkpoint inspector (/root/reference/check_ckpt.py:8-18, which lists a
TF checkpoint's variables and shapes) for the ner_spark weights .npz.

Usage:
    python tools/inspect_weights.py [path.npz]

Without a path, inspects the runtime-resolved artifact (env var /
SparkFiles), falling back to a description of the builtin generator.
Prints one JSON line: version, tensor shapes/dtypes, transition-matrix
stats, gazetteer size, scalar hyper-parameters.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def describe(path: str | None = None) -> dict:
    from ner_spark.model import tagger
    from ner_spark.model.artifact import (
        BUILTIN_VERSION,
        _runtime_artifact_path,
        load_weights,
    )

    def tensor_stats(t) -> dict:
        return {
            "shape": list(t.shape),
            "dtype": str(t.dtype),
            "mean": round(float(t.mean()), 6),
            "min": round(float(t.min()), 6),
            "max": round(float(t.max()), 6),
        }

    if path is None:
        path = _runtime_artifact_path()
    if path is None:
        return {
            "source": "builtin",
            "version": BUILTIN_VERSION,
            "transitions": tensor_stats(tagger.transitions()),
            "n_tags": tagger.N_TAGS,
            "tag_names": tagger.TAG_NAMES,
        }
    w = load_weights(path)
    return {
        "source": path,
        "version": w["version"],
        "transitions": tensor_stats(w["transitions"]),
        "gazetteer_tokens": len(w["roles"]),
        "gazetteer_entries": int(sum(len(v) for v in w["roles"].values())),
        "scalars": {
            "gaz_boost": w["scalars"][0],
            "o_base": w["scalars"][1],
            "noise_scale": w["scalars"][2],
        },
    }


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else None
    print(json.dumps(describe(path)))


if __name__ == "__main__":
    main()
