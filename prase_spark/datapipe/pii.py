"""PII detection and redaction for web-scale corpus curation.

The reference pipeline has no PII stage (its inputs are already-clean KG
dumps, ``objects/KGs.py:481-539``); this module is part of the
beyond-reference training-data curation suite: before web text is
packed into training samples, emails / IP addresses / phone numbers are
counted (to drop dox-like pages entirely) and redacted in the survivors.

Patterns deliberately avoid lookaround and backreferences so the same
source string parses identically under Java regex (Spark executors) and
RE2 (the DuckDB oracle twin).

Scale shape: every function here is a per-row native regexp expression —
one narrow map stage inside whole-stage codegen, no shuffle, no Python.
At 100 TB this is scan-bound; cost is a fixed small multiple of the scan
regardless of cluster size, so it scales embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dict order is the REDACTION order and it matters: emails go first so an
# address like u1@10.0.0.1 can never be half-eaten by the IPv4 rule, and
# phones (which contain no dots) are independent of both.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,2}-\d{3}-\d{3}-\d{4}",
}

REDACTIONS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of non-overlapping ``kind`` matches in the text (int)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind]))


def add_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one ``n_<kind>`` int column per PII class."""
    return df.select(
        "*",
        *[pii_count(text_col, k).alias(f"n_{k}") for k in PII_PATTERNS],
    )


def redact_pii(col: Column | str) -> Column:
    """Text with every PII match replaced by its class token.

    Counting on already-redacted text returns 0 for every class: the
    replacement tokens contain no digits or ``@``.
    """
    c = F.col(col) if isinstance(col, str) else col
    for kind, pattern in PII_PATTERNS.items():
        c = F.regexp_replace(c, pattern, REDACTIONS[kind])
    return c


def redact_corpus(
    df: DataFrame,
    text_col: str = "text",
    max_hits: int | None = None,
) -> DataFrame:
    """Per-class counts + redacted text; optionally drop dox-like rows.

    ``max_hits`` is the page-level kill rule: a page with more than
    ``max_hits`` total PII matches (contact dumps, scraped directories)
    is removed outright rather than redacted — redacting a page that is
    MOSTLY PII leaves no usable training text. ``None`` keeps all rows.
    """
    out = add_pii_counts(df, text_col).withColumn(
        f"{text_col}_redacted", redact_pii(text_col)
    )
    if max_hits is not None:
        total = sum(F.col(f"n_{k}") for k in PII_PATTERNS)
        out = out.filter(total <= F.lit(max_hits))
    return out
