#!/usr/bin/env python
"""CLI for ner_spark.model.convert: ingest an external trained-model
dump (npz/json carrying the learned CRF ``transitions`` tensor — the
shape the reference's ONNX export returns, /root/reference/predict.py:19)
and emit the versioned ner_spark weights artifact.

Usage:
    python tools/convert_weights.py SRC OUT.npz --version VERSION

Prints one JSON line describing the converted artifact (via
tools/inspect_weights.py's describe()).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="external dump (.npz or .json with 'transitions' [+ 'tags'])")
    ap.add_argument("out", help="output artifact path (.npz)")
    ap.add_argument("--version", required=True, help="artifact version string (manifest fingerprint)")
    args = ap.parse_args()

    from ner_spark.model.convert import convert_external_artifact

    out = convert_external_artifact(args.src, args.out, args.version)

    import inspect_weights

    print(json.dumps(inspect_weights.describe(out)))


if __name__ == "__main__":
    main()
