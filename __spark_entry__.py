"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query (transcripts → tag →
extract → triples) at sf0.001. ``queries()`` exposes every implemented
operator (SURVEY.md §2 + the training-data pipeline ops) as
``(spark, sf_dir) -> DataFrame`` callables; ``oracle_sql()`` provides
the DuckDB-executable ANSI-SQL equivalent for EVERY query — the kg_*
oracles read the plain-Python reference goldens (independent
implementation: row-wise Viterbi, per-row extraction state machine,
union-find) instead of restating the pipeline in SQL, making them
cross-implementation checks rather than self-fulfilling ones.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: all (subj, pred, obj) triples of the deterministic
    sf0.001 transcripts fixture, in stable turn order."""
    from ner_spark.entry_queries import QUERIES

    # queries() callables key off the sf basename; fixture is synthesized
    # deterministically (seeded) — no external data.
    return QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ner_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ner_spark.entry_queries import ORACLES

    return dict(ORACLES)
