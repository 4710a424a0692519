#!/usr/bin/env python
"""Package ner_spark for cluster submission:

    python tools/make_pyfiles.py            # writes dist/ner_spark.zip
    spark-submit --py-files dist/ner_spark.zip run_pipeline.py ...

The zip contains the package sources only (no fixtures/tests); executors
import it from the distributed file cache — the mechanism the reference's
own README documents for shipping Python deps to Spark executors
(/root/reference/README.md:199-239).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "ner_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "ner_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    p = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(p)
