"""Legacy-format export projections + CSV sinks (S6).

Engine interchange is typed Parquet; these renders exist only for
compatibility with the reference's CSV artifacts
(combine_contacts.py:1457-1487,1562-1568): emails/phones as
"value::label|…" pipe strings (phones render extensions as 'valuexEXT'),
addresses as a JSON-array string.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

LEGACY_CONTACT_COLUMNS = [
    "contact_id", "full_name", "prefix", "first_name", "middle_name",
    "last_name", "maiden_name", "suffix", "suffix_professional", "nickname",
    "company", "title", "department", "linkedin_url", "emails", "phones",
    "addresses_json", "source_count", "source_row_count",
]


def _phone_render(p) -> F.Column:
    return F.when(p["extension"] != "",
                  F.concat(p["value"], F.lit("x"), p["extension"])) \
        .otherwise(p["value"])


def render_legacy_contacts(contacts: DataFrame) -> DataFrame:
    """Typed consolidated contacts → the reference's 19-column layout."""
    return contacts.select(
        *[c for c in LEGACY_CONTACT_COLUMNS
          if c not in ("emails", "phones", "addresses_json")],
        F.array_join(F.transform(
            F.coalesce("emails", F.array()),
            lambda e: F.concat(e["value"], F.lit("::"), e["label"])), "|")
        .alias("emails"),
        F.array_join(F.transform(
            F.coalesce("phones", F.array()),
            lambda p: F.concat(_phone_render(p), F.lit("::"), p["label"])),
            "|").alias("phones"),
        F.to_json(F.coalesce("addresses", F.array())).alias("addresses_json"),
    ).select(*LEGACY_CONTACT_COLUMNS)


def render_tagged(tagged: DataFrame) -> DataFrame:
    """tagged_contacts.csv layout: legacy columns + score/tags/category."""
    legacy = render_legacy_contacts(tagged)
    extra = tagged.select("contact_id", "confidence_score", "tags",
                          "relationship_category", "notes_blob",
                          "referral_priority_score")
    return legacy.join(extra, "contact_id")


def write_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """QUOTE_ALL utf-8 CSV, reference sink shape (S6). coalesce(1) only
    for the small final exports — never for engine interchange."""
    out = df.coalesce(1) if single_file else df
    # escape='"' → RFC-4180 doubled quotes like the reference's csv
    # QUOTE_ALL output (Spark's default backslash-escape is non-standard)
    out.write.mode("overwrite").option("header", True) \
        .option("quoteAll", True).option("escape", '"').csv(path)


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None) -> None:
    """Engine-internal interchange: typed, columnar, splittable."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
