"""Stage 3 — confidence: additive capped score + bucket (C3-C4, A3).

One arithmetic projection over contacts ⟕ validation ⟕ flattened
(confidence_report.py:110-262). Both joins are contact_id equi-joins on
same-cardinality tables — sort-merge at scale, broadcast when small;
Catalyst decides via AQE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_PRESENCE_WORK = ("work_email", "work_phone", "work_address")


def confidence_report(contacts: DataFrame, validation: DataFrame,
                      flattened: DataFrame) -> DataFrame:
    """C3 score (0-100 int) + C4 bucket per contact."""
    vmap = validation.select(
        "contact_id", "email_valid_count", "email_total",
        "phone_valid_count", "phone_total", "addr_valid_count",
        "quality_score")
    flat = flattened.select(
        "contact_id", *[F.col(c) for c in _PRESENCE_WORK])
    df = contacts.join(vmap, "contact_id", "left") \
        .join(flat, "contact_id", "left")

    emails = F.coalesce("emails", F.array())
    phones = F.coalesce("phones", F.array())
    nonblank = lambda c: F.trim(F.coalesce(F.col(c), F.lit(""))) != ""  # noqa: E731

    email_all_valid = (F.coalesce("email_total", F.lit(0)) > 0) & (
        F.col("email_total") == F.col("email_valid_count"))
    phone_all_valid = (F.coalesce("phone_total", F.lit(0)) > 0) & (
        F.col("phone_total") == F.col("phone_valid_count"))
    addr_any_valid = F.coalesce("addr_valid_count", F.lit(0)) > 0

    corroborators = (
        (F.size(emails) > 0).cast("int")
        + (F.size(phones) > 0).cast("int")
        + (F.size(F.coalesce("addresses", F.array())) > 0).cast("int")
        + nonblank("linkedin_url").cast("int"))

    lineage_depth = F.coalesce("source_count", F.lit(1))
    work_channels = sum(
        (F.trim(F.coalesce(F.col(c), F.lit(""))) != "").cast("int")
        for c in _PRESENCE_WORK)

    all_invalid = lambda arr: (F.size(arr) > 0) & F.forall(  # noqa: E731
        arr, lambda x: (x["value"] == "") | (F.lower(x["label"]) == "invalid"))

    score = (
        F.round(F.least(F.coalesce("quality_score", F.lit(0)), F.lit(100))
                * 0.4, 0)
        + F.least(corroborators * 5, F.lit(20))
        + F.when(lineage_depth >= 3, 10).when(lineage_depth == 2, 6)
        .otherwise(2)
        + F.when(nonblank("linkedin_url"), 6).otherwise(0)
        + F.when(nonblank("company") | nonblank("title"), 6).otherwise(0)
        + F.when(nonblank("department"), 3).otherwise(0)
        + F.when(work_channels > 0, F.least(work_channels * 2, F.lit(6)))
        .otherwise(0)
        + F.when(email_all_valid, 5).otherwise(0)
        + F.when(phone_all_valid, 3).otherwise(0)
        + F.when(addr_any_valid, 2).otherwise(0)
        + F.when(nonblank("first_name") & nonblank("last_name"), 3)
        .otherwise(0)
        + F.when(nonblank("full_name"), 2).otherwise(0)
        - F.when(all_invalid(emails), 5).otherwise(0)
        - F.when(all_invalid(phones), 4).otherwise(0))

    df = df.withColumn(
        "confidence_score",
        F.floor(F.greatest(F.lit(0), F.least(F.lit(100), score)))
        .cast("int"))
    return df.withColumn(
        "confidence_bucket",
        F.when(F.col("confidence_score") >= 80, "very_high")
        .when(F.col("confidence_score") >= 60, "high")
        .when(F.col("confidence_score") >= 40, "medium")
        .otherwise("low"))


_BUCKETS = ("very_high", "high", "medium", "low")


def confidence_summary(scored: DataFrame) -> DataFrame:
    """A3: bucket histogram with percentages (confidence_report.py:239-262).

    The reference always emits all four buckets in severity order,
    zero-filled. ONE map-side-combined aggregation produces a single
    row of conditional counts; stack() pivots it to the 4-row layout —
    no second job and no shuffle of the big table beyond the agg. The
    severity order is pinned by an explicit orderBy on the bucket's
    rank (4 rows — free), not stack() generation order, which a plan
    change could silently permute."""
    agg = scored.agg(
        F.count("*").alias("total"),
        *[F.count(F.when(F.col("confidence_bucket") == b, 1))
          .alias(f"c{i}") for i, b in enumerate(_BUCKETS)])
    quoted = ", ".join(f"'{b}', c{i}" for i, b in enumerate(_BUCKETS))
    severity_rank = F.array_position(
        F.array(*[F.lit(b) for b in _BUCKETS]), F.col("bucket"))
    return agg.select(
        F.expr(f"stack({len(_BUCKETS)}, {quoted}) AS (bucket, count)"),
        "total",
    ).select(
        "bucket", "count",
        F.coalesce(F.round(100.0 * F.col("count") / F.col("total"), 2),
                   F.lit(0.0)).alias("pct"),
    ).orderBy(severity_rank)
