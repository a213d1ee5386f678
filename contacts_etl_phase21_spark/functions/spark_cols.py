"""Spark Column builders + pandas UDF wrappers for the scalar library.

Two tiers, per SURVEY.md §2.3:
- Column builders (col_*): pure pyspark.sql.functions expression chains
  → JVM-side, whole-stage codegen, no Python in the hot path.
- pandas UDFs (udf_*): Arrow-batched wrappers around the pure-Python
  cores, for semantics built-ins can't express (NFKD fold, difflib
  ratio, the branchy name parser).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, DoubleType, StringType, StructField, StructType,
)

from contacts_etl_phase21_spark.functions import names as _names
from contacts_etl_phase21_spark.functions import similarity as _sim
from contacts_etl_phase21_spark.functions import text as _text

# ---------------------------------------------------------------------------
# Column-expression tier (JVM, codegen)
# ---------------------------------------------------------------------------


def col_fold_text(c: Column) -> Column:
    """ASCII fast path of fold_text: trim, collapse whitespace, lower.
    (Full NFKD accent folding needs udf_fold_text — Spark has no NFKD
    builtin; for ASCII data the two agree.)"""
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def col_email_domain(c: Column) -> Column:
    """Domain after the last '@' (tagging.py:19-28)."""
    return F.when(c.contains("@"), F.lower(F.substring_index(c, "@", -1))) \
        .otherwise(F.lit(""))


def col_clean_email(c: Column) -> Column:
    """Fallback-tier email normalization (normalization.py:274-279):
    strip spaces, lower, keep iff regex-valid."""
    compact = F.lower(F.regexp_replace(F.trim(c), " ", ""))
    return F.when(
        compact.rlike(r"^[A-Za-z0-9._%+\-']+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}$"),
        compact).otherwise(F.lit(""))


def col_phone_e164_fallback(c: Column) -> Column:
    """The no-phonenumbers E.164 ladder (normalization.py:297-327) as a
    when-chain: 10 digits → +1d, 11 with leading 1 → +d, 12-15 (no '+')
    → +d, '+…' → strip to digits, else +1d."""
    s = F.trim(c)
    d = F.regexp_replace(s, r"\D", "")
    n = F.length(d)
    plus = s.startswith("+")
    return (
        F.when(s == "", F.lit(""))
        .when(n == 10, F.concat(F.lit("+1"), d))
        .when((n == 11) & d.startswith("1"), F.concat(F.lit("+"), d))
        .when((n > 11) & (n <= 15) & ~plus, F.concat(F.lit("+"), d))
        .when(plus, F.concat(F.lit("+"), d))
        .when(n > 0, F.concat(F.lit("+1"), d))
        .otherwise(s)
    )


def col_pct(numerator: Column, denominator: Column, digits: int = 2) -> Column:
    """round(100·n/d, digits) with zero-denominator → 0.0."""
    return F.when(denominator == 0, F.lit(0.0)).otherwise(
        F.round(100.0 * numerator / denominator, digits))


# ---------------------------------------------------------------------------
# pandas UDF tier (Arrow batches)
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def udf_fold_text(s: pd.Series) -> pd.Series:
    return s.map(_text.fold_text)


@pandas_udf(DoubleType())
def udf_seq_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([_sim.seq_ratio(x, y) for x, y in zip(a, b)])


PARSED_NAME_SCHEMA = StructType([
    StructField("first_name", StringType()),
    StructField("middle_name", StringType()),
    StructField("last_name", StringType()),
    StructField("suffix", StringType()),
    StructField("suffix_professional", StringType()),
    StructField("maiden_name", StringType()),
    StructField("prefix", StringType()),
    StructField("full_name_clean", StringType()),
])


@pandas_udf(PARSED_NAME_SCHEMA)
def udf_parse_full_name(s: pd.Series) -> pd.DataFrame:
    rows = []
    for value in s:
        p = _names.parse_full_name(value)
        rows.append((p.first, p.middle, p.last, p.generational,
                     " ".join(p.professional), p.maiden, p.prefix, p.clean_full))
    return pd.DataFrame(rows, columns=[f.name for f in PARSED_NAME_SCHEMA.fields])


@pandas_udf(ArrayType(StringType()))
def udf_char_shingles(s: pd.Series) -> pd.Series:
    return s.map(lambda t: sorted(_sim.char_shingles(t)))


@pandas_udf(StringType())
def udf_nickname_root(s: pd.Series) -> pd.Series:
    return s.map(_names.nickname_root)
