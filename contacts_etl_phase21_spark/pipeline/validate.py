"""Stage 2 — validate: channel validity counts + quality score (C1-C2, A2).

The reference re-parses "value::label|…" strings per row
(validate_quality.py:21-191); on typed arrays the same semantics are
pure higher-order-function columns — no Python in the hot path, one
projection plus one broadcast-ready join to the flattened pivot.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from contacts_etl_phase21_spark.pipeline.config import QualityWeights

_PRESENCE = ("home_email", "work_email", "home_phone", "work_phone",
             "home_address", "work_address")


def validation_report(contacts: DataFrame, flattened: DataFrame,
                      weights: QualityWeights = QualityWeights()) -> DataFrame:
    """C1 validity counts + detail JSON + C2 quality score per contact."""
    email_valid = lambda e: (e["value"] != "") & (F.lower(e["label"]) != "invalid")  # noqa: E731
    phone_valid = lambda p: (p["value"] != "") & (F.lower(p["label"]) != "invalid")  # noqa: E731
    addr_valid = lambda a: (F.trim(a["street"]) != "") & (
        (F.trim(a["city"]) != "") | (F.trim(a["postal_code"]) != ""))  # noqa: E731

    emails = F.coalesce("emails", F.array())
    phones = F.coalesce("phones", F.array())
    addresses = F.coalesce("addresses", F.array())

    df = contacts.select(
        "contact_id", "full_name", "company", "title",
        F.coalesce(F.trim("department"), F.lit("")).alias("department"),
        "linkedin_url",
        F.size(F.filter(emails, email_valid)).alias("email_valid_count"),
        F.size(emails).alias("email_total"),
        F.size(F.filter(phones, phone_valid)).alias("phone_valid_count"),
        F.size(phones).alias("phone_total"),
        F.size(F.filter(addresses, addr_valid)).alias("addr_valid_count"),
        F.size(addresses).alias("addr_total"),
        F.to_json(F.transform(emails, lambda e: F.struct(
            e["value"].alias("email"), e["label"].alias("label"),
            email_valid(e).alias("valid")))).alias("emails_detail"),
        # reference phones_detail is the VALID rendered values only, as a
        # JSON string list — not objects (validate_quality.py:38-58)
        F.to_json(F.transform(
            F.filter(phones, phone_valid),
            lambda p: F.when(p["extension"] != "",
                             F.concat(p["value"], F.lit("x"),
                                      p["extension"]))
            .otherwise(p["value"]))).alias("phones_detail"),
        # reference strips every address field in the detail objects
        # (validate_quality.py:71-88)
        F.to_json(F.transform(addresses, lambda a: F.struct(
            F.trim(a["street"]).alias("street"),
            F.trim(a["city"]).alias("city"),
            F.trim(a["state"]).alias("state"),
            F.trim(a["postal_code"]).alias("postal_code"),
            F.trim(a["country"]).alias("country"),
            addr_valid(a).alias("valid")))).alias("addresses_detail"),
    ).withColumn(
        "department_missing",
        F.when(F.col("department") == "", 1).otherwise(0))

    flat_flags = flattened.select(
        "contact_id", *[
            F.when(F.trim(F.coalesce(c, F.lit(""))) != "", 1).otherwise(0)
            .alias(f"{c}_present") for c in _PRESENCE])
    df = df.join(flat_flags, "contact_id", "left").fillna(
        0, subset=[f"{c}_present" for c in _PRESENCE])

    email_score = (
        F.when((F.col("email_total") > 0)
               & (F.col("email_valid_count") == F.col("email_total")),
               weights.email_full_score)
        .when(F.col("email_valid_count") > 0, weights.email_partial_score)
        .otherwise(0))
    phone_score = (
        F.when((F.col("phone_total") > 0)
               & (F.col("phone_valid_count") == F.col("phone_total")),
               weights.phone_full_score)
        .when(F.col("phone_valid_count") > 0, weights.phone_partial_score)
        .otherwise(0))
    addr_score = F.when(F.col("addr_valid_count") > 0,
                        weights.address_any_score).otherwise(0)
    return df.withColumn("quality_score",
                         email_score + phone_score + addr_score)


def validation_summary(report: DataFrame) -> DataFrame:
    """A2: dataset-level presence percentages — one map-side-combined
    aggregation (validate_quality.py:223-233)."""
    return report.agg(
        F.count("*").alias("total_contacts"),
        F.round(100.0 * F.avg((F.col("email_valid_count") > 0).cast("int")), 2)
        .alias("has_any_email_pct"),
        F.round(100.0 * F.avg((F.col("phone_valid_count") > 0).cast("int")), 2)
        .alias("has_any_phone_pct"),
        F.round(100.0 * F.avg((F.col("addr_valid_count") > 0).cast("int")), 2)
        .alias("has_any_addr_pct"),
        F.round(F.avg("quality_score"), 2).alias("avg_quality_score"),
    )
