"""Source union (S5): three loaders → one typed DataFrame.

Parity: _load_sources (combine_contacts.py:1099-1104).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from contacts_etl_phase21_spark.sources.gmail import load_gmail
from contacts_etl_phase21_spark.sources.linkedin import load_linkedin
from contacts_etl_phase21_spark.sources.vcard import load_vcards


def load_sources(spark: SparkSession,
                 linkedin_csv: str | None = None,
                 gmail_csv: str | None = None,
                 mac_vcf: str | None = None) -> DataFrame:
    parts: list[DataFrame] = []
    if linkedin_csv:
        parts.append(load_linkedin(spark, linkedin_csv))
    if gmail_csv:
        parts.append(load_gmail(spark, gmail_csv))
    if mac_vcf:
        parts.append(load_vcards(spark, mac_vcf))
    if not parts:
        raise ValueError("at least one source path is required")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)
