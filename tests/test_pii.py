"""PII scan/redaction invariants (functions/pii.py)."""

import pyspark.sql.functions as F
import pytest

from ner_spark.functions.pii import (
    PII_PATTERNS,
    pii_count_cols,
    pii_inject_col,
    redact_col,
)


@pytest.fixture(scope="module")
def injected(spark):
    base = spark.createDataFrame(
        [(i, f"doc body {i} with words") for i in range(60)],
        "doc_id bigint, text string",
    )
    return base.select(
        "doc_id",
        pii_inject_col(F.col("text"), F.col("doc_id")).alias("text"),
    ).cache()


def test_injection_residue_classes(injected):
    rows = {
        r["doc_id"]: r
        for r in injected.select("doc_id", *pii_count_cols(F.col("text"))).collect()
    }
    mods = {"email": 2, "phone": 3, "ssn": 5, "ipv4": 4, "card": 7}
    for doc_id in range(60):
        for kind, m in mods.items():
            want = 1 if doc_id % m == 0 else 0
            assert rows[doc_id][f"n_{kind}"] == want, (doc_id, kind)


def test_clean_doc_untouched(injected):
    # doc_id 1: no residue class hits — text must be the raw body
    row = injected.where(F.col("doc_id") == 1).collect()[0]
    assert row["text"] == "doc body 1 with words"


def test_redaction_removes_every_match(injected):
    red = injected.select("doc_id", redact_col(F.col("text")).alias("text"))
    counts = red.select(
        *[F.sum(c).alias(c._jc.toString()) for c in pii_count_cols(F.col("text"))]
    ).collect()[0]
    assert all(v == 0 for v in counts), dict(counts.asDict())


def test_tokens_cannot_cascade():
    # replacement tokens must not themselves match any pattern (a later
    # substitution can never be created by an earlier one)
    import re

    for _, _, tok in PII_PATTERNS:
        for _, pat, _ in PII_PATTERNS:
            assert not re.search(pat, tok), (tok, pat)


def test_redaction_token_placement(injected):
    row = (
        injected.where(F.col("doc_id") == 0)
        .select(redact_col(F.col("text")).alias("text"))
        .collect()[0]
    )
    # doc 0 hits every residue class; every typed token must appear
    for tok in ("[EMAIL]", "[PHONE]", "[SSN]", "[IP]", "[CARD]"):
        assert tok in row["text"], row["text"]
