"""PII detection and redaction for training-data pipelines.

A 100 TB pretraining corpus is scrubbed before tokenization: find
emails / phone numbers / IPv4 addresses / SSN-shaped ids, count them
(corpus health metrics) and replace them with typed placeholder tokens.

Everything here is pure column expressions over JVM regex — codegen'd,
no Python in the loop, so the scrub is a projection fused into the
scan at scale (reference analogue: the email/phone harvesting regexes
in normalization.py — same pattern family, applied here to documents
rather than contact cells).

Pattern-dialect rule: every regex must mean the same thing to Java
(Spark) and RE2 (DuckDB oracle) — no lookarounds, no backreferences,
ASCII classes only. That keeps each operator oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Ordered (kind, pattern, placeholder). Order is semantic: redaction is
# sequential, each pattern runs on the output of the previous one, and
# the patterns are mutually non-overlapping on counts (SSN is 3-2-4
# digits, phone is 3-3-4; IPv4 segments are 1-3 digits x4) so counting
# on the ORIGINAL text is exact.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(\d{3}\)\s?\d{3}[-.]\d{4}|\b\d{3}[-.]\d{3}[-.]\d{4}\b",
     "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts on the raw text (kinds are disjoint)."""
    return {kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            for kind, pat, _ in PII_RULES}


def redact_pii(text: Column) -> Column:
    """Sequential typed redaction in PII_RULES order."""
    out = text
    for _, pat, token in PII_RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_documents(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Scan-shaped scrub: id, per-kind counts, redacted text. At scale
    this is the projection the tokenizer reads — filters on the counts
    (e.g. drop docs with > N emails) push into the same scan."""
    text = F.col(text_col)
    counts = pii_counts(text)
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        redact_pii(text).alias("redacted"),
    )
