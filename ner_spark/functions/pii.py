"""PII detection and redaction over document text.

A training-data pipeline has to find and strip personally identifiable
information before corpus release. This module implements the standard
regex families (email, phone, SSN, IPv4, payment card) as pure JVM
column expressions — ``regexp_count`` / ``regexp_replace`` run inside
whole-stage codegen, so the scan is a single narrow projection with no
Python in the hot path and no shuffle: it scales linearly with input
bytes at any cluster size.

Cross-engine contract: the patterns below are written in the common
subset of Java ``java.util.regex`` (Spark) and RE2 (DuckDB oracle) —
ASCII classes, ``\\b`` word boundaries, bounded repetition, no
lookaround — so both engines find the same matches. ``REDACT_ORDER``
fixes the substitution sequence (card before SSN before phone: their
digit-dash shapes overlap); replacement tokens contain no digits, so a
substitution can never create a new match for a later pattern.

The synthetic ``documents`` fixture contains no natural PII, so the
query surface injects deterministic PII spans derived from ``doc_id``
(``pii_inject_col`` here, mirrored expression-for-expression by
``pii_inject_sql`` for the DuckDB oracle): every doc_id residue class
gets a different subset of PII kinds, including docs with none — no
external data, reproducible at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement-token) in redaction order. Patterns must
# stay in the Java∩RE2 regex subset (see module docstring).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("card", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\(\d{3}\) \d{3}-\d{4}", "[PHONE]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_count_cols(text: Column) -> list[Column]:
    """Per-kind match counts on the given text, as ``n_<kind>`` BIGINT
    columns. Counted on the un-redacted text: the injected shapes are
    mutually non-overlapping (card's 4-4-4-4 digit runs admit no
    embedded \\b-delimited SSN, phone requires a parenthesis, IPv4
    requires dots), so counting before vs during redaction is
    equivalent — and identical across engines either way."""
    return [
        F.regexp_count(text, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]


def redact_col(text: Column) -> Column:
    """Apply every PII substitution in ``PII_PATTERNS`` order. Tokens
    carry no digits, so earlier substitutions cannot create later
    matches; Java regexp_replace is replace-all by default (the oracle
    passes the 'g' flag for the same semantics)."""
    out = text
    for _name, pat, tok in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tok)
    return out


# --------------------------------------------------------------------------
# Deterministic PII injection (Spark column + DuckDB SQL mirror)
# --------------------------------------------------------------------------

def pii_inject_col(text: Column, doc_id: Column) -> Column:
    """text ⊕ deterministic PII spans chosen by doc_id residues.

    Residue classes (independent moduli so kinds co-occur in varying
    combinations): email ⇔ id%2=0, phone ⇔ id%3=0, ssn ⇔ id%5=0,
    ipv4 ⇔ id%4=0, card ⇔ id%7=0. id%2=1 ∧ id%3∈{1,2} ∧ … docs get
    nothing — the clean-document path is exercised too.

    Must stay expression-for-expression identical to
    :func:`pii_inject_sql`.
    """
    d = doc_id

    def s(col: Column) -> Column:
        return col.cast("string")

    email = F.concat(
        F.lit(" reach user"), s(d), F.lit("@example.com")
    )
    phone = F.concat(
        F.lit(" call ("),
        F.lpad(s(d % 900 + 100), 3, "0"),
        F.lit(") 555-"),
        F.lpad(s(d % 10000), 4, "0"),
    )
    ssn = F.concat(
        F.lit(" ssn "),
        F.lpad(s(d % 900 + 100), 3, "0"),
        F.lit("-"),
        F.lpad(s(d % 100), 2, "0"),
        F.lit("-"),
        F.lpad(s(d % 10000), 4, "0"),
    )
    ipv4 = F.concat(
        F.lit(" host 10."),
        s(d % 256),
        F.lit("."),
        s((d * 7) % 256),
        F.lit("."),
        s(d % 254 + 1),
    )
    card = F.concat(
        F.lit(" card 4111-1111-"),
        F.lpad(s(d % 10000), 4, "0"),
        F.lit("-"),
        F.lpad(s((d * 3) % 10000), 4, "0"),
    )
    empty = F.lit("")
    return F.concat(
        text,
        F.when(d % 2 == 0, email).otherwise(empty),
        F.when(d % 3 == 0, phone).otherwise(empty),
        F.when(d % 5 == 0, ssn).otherwise(empty),
        F.when(d % 4 == 0, ipv4).otherwise(empty),
        F.when(d % 7 == 0, card).otherwise(empty),
    )


def pii_inject_sql(text: str = "text", doc_id: str = "doc_id") -> str:
    """DuckDB expression mirroring :func:`pii_inject_col` (same residue
    classes, same lpad widths, same literal fragments)."""
    d = doc_id
    email = f"' reach user' || CAST({d} AS VARCHAR) || '@example.com'"
    phone = (
        f"' call (' || lpad(CAST({d} % 900 + 100 AS VARCHAR), 3, '0')"
        f" || ') 555-' || lpad(CAST({d} % 10000 AS VARCHAR), 4, '0')"
    )
    ssn = (
        f"' ssn ' || lpad(CAST({d} % 900 + 100 AS VARCHAR), 3, '0')"
        f" || '-' || lpad(CAST({d} % 100 AS VARCHAR), 2, '0')"
        f" || '-' || lpad(CAST({d} % 10000 AS VARCHAR), 4, '0')"
    )
    ipv4 = (
        f"' host 10.' || CAST({d} % 256 AS VARCHAR)"
        f" || '.' || CAST(({d} * 7) % 256 AS VARCHAR)"
        f" || '.' || CAST({d} % 254 + 1 AS VARCHAR)"
    )
    card = (
        f"' card 4111-1111-' || lpad(CAST({d} % 10000 AS VARCHAR), 4, '0')"
        f" || '-' || lpad(CAST(({d} * 3) % 10000 AS VARCHAR), 4, '0')"
    )
    return (
        f"{text}"
        f" || CASE WHEN {d} % 2 = 0 THEN {email} ELSE '' END"
        f" || CASE WHEN {d} % 3 = 0 THEN {phone} ELSE '' END"
        f" || CASE WHEN {d} % 5 = 0 THEN {ssn} ELSE '' END"
        f" || CASE WHEN {d} % 4 = 0 THEN {ipv4} ELSE '' END"
        f" || CASE WHEN {d} % 7 = 0 THEN {card} ELSE '' END"
    )


def pii_count_sql(text: str) -> str:
    """DuckDB mirror of :func:`pii_count_cols` (comma-joined select
    fragments)."""
    return ",\n           ".join(
        f"CAST(length(regexp_extract_all({text}, '{pat}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _tok in PII_PATTERNS
    )


def pii_redact_sql(text: str) -> str:
    """DuckDB mirror of :func:`redact_col` ('g' flag = replace-all,
    matching Java semantics)."""
    expr = text
    for _name, pat, tok in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{tok}', 'g')"
    return expr
