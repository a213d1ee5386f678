"""Stage 4 — tag: keyword/rule tagging + referral priority (C5-C6, J6, O1).

TagEngine (reference tagging.py:51-122) as column algebra: regex rlike
for keyword families, exists() HOFs over channels/addresses for the
rule tags, a when-precedence chain for the primary category, and pure
arithmetic for the referral score. The notes blob is the J6 join:
lineage ⋈ per-source notes → grouped ordered concat.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from contacts_etl_phase21_spark.pipeline.config import TaggingSettings

MARTIAL_RE = r"(tai\s*chi|wu\s*an|wu\s*dao|kung\s*fu|shaolin|martial\s*arts)"
NUTCRACKER_RE = r"(nutcracker|\bcherub(s)?\b|jose\s*mateo|ballet)"

TAG_WEIGHTS = {"martial_arts": 30, "nutcracker_performance": 25,
               "work_colleague": 20, "local_south_shore": 10}


def notes_blob(lineage: DataFrame, raw_records: DataFrame) -> DataFrame:
    """J6: per-contact ' | '-joined notes from gmail/vCard source rows,
    in cluster (rid) order. lineage ⋈ notes is an equi-join on (source,
    source_row_id); the concat is an ordered collect per contact."""
    notes = raw_records.filter(
        F.lower("source").isin("gmail", "mac_vcf")
        & (F.trim(F.coalesce("notes", F.lit(""))) != "")) \
        .select("source", "source_row_id", F.trim("notes").alias("note"))
    order = F.when(F.lower("source") == "gmail", 1) \
        .when(F.lower("source") == "mac_vcf", 2).otherwise(3)
    joined = lineage.select("contact_id", "source", "source_row_id") \
        .join(notes, ["source", "source_row_id"]) \
        .withColumn("_ord", order)
    return joined.groupBy("contact_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("_ord"),
                    F.expr("try_cast(source_row_id AS long)").alias("_rid"),
                    F.col("note")))),
                lambda s: s["note"]),
            " | ").alias("notes_blob"))


def tag_contacts(contacts: DataFrame, confidence: DataFrame,
                 notes: DataFrame | None = None,
                 settings: TaggingSettings = TaggingSettings()) -> DataFrame:
    """C5 tags + primary category + C6 referral priority."""
    df = contacts.join(
        confidence.select("contact_id", "confidence_score"),
        "contact_id", "left")
    if notes is not None:
        df = df.join(notes, "contact_id", "left")
    else:
        df = df.withColumn("notes_blob", F.lit(""))
    df = df.withColumn("notes_blob", F.coalesce("notes_blob", F.lit("")))

    blob = F.lower(F.concat_ws(" ", "company", "title", "linkedin_url",
                               "notes_blob"))
    company = F.lower(F.coalesce("company", F.lit("")))
    domains = F.transform(
        F.filter(F.coalesce("emails", F.array()),
                 lambda e: e["value"].contains("@")),
        lambda e: F.lower(F.substring_index(e["value"], "@", -1)))

    tag_martial = blob.rlike(MARTIAL_RE)
    tag_nutcracker = blob.rlike(NUTCRACKER_RE)

    companies = settings.normalized_companies()
    tag_work_company = F.lit(False)
    for prior in companies:
        tag_work_company = tag_work_company | (
            (company != "") & company.contains(prior))
    tag_work_domain = F.lit(False)
    for prior in settings.normalized_domains():
        tag_work_domain = tag_work_domain | F.exists(
            domains, lambda d: d.contains(prior))
    tag_work = tag_work_company | tag_work_domain

    cities = settings.normalized_cities()
    def _city_match(a):  # state == MA and city matches the local list
        city = F.lower(F.trim(a["city"]))
        hit = F.lit(False)
        for lc in cities:
            hit = hit | (city == lc) | city.contains(lc)
        return (F.lower(F.trim(a["state"])) == "ma") & hit
    tag_local = F.exists(F.coalesce("addresses", F.array()), _city_match) \
        if cities else F.lit(False)

    df = (
        df.withColumn("_t_martial", tag_martial)
        .withColumn("_t_nutcracker", tag_nutcracker)
        .withColumn("_t_work", tag_work)
        .withColumn("_t_local", tag_local)
        .withColumn("tags", F.array_join(F.array_sort(F.filter(F.array(
            F.when(F.col("_t_martial"), "martial_arts"),
            F.when(F.col("_t_nutcracker"), "nutcracker_performance"),
            F.when(F.col("_t_work"), "work_colleague"),
            F.when(F.col("_t_local"), "local_south_shore")),
            lambda x: x.isNotNull())), "|"))
        .withColumn("relationship_category", F.when(
            F.col("_t_martial") | F.col("_t_nutcracker"), "personal")
            .when(F.col("_t_work")
                  | (F.trim(F.coalesce("linkedin_url", F.lit(""))) != ""),
                  "professional")
            .when(F.col("_t_local"), "local_referral")
            .otherwise("uncategorized"))
    )

    tag_bonus = sum(
        F.when(F.col(flag), weight).otherwise(0)
        for flag, weight in (("_t_martial", 30), ("_t_nutcracker", 25),
                             ("_t_work", 20), ("_t_local", 10)))
    df = df.withColumn(
        "referral_priority_score",
        F.least(F.lit(100), F.round(
            F.coalesce("confidence_score", F.lit(0)) * 0.6 + tag_bonus, 0))
        .cast("int"))
    return df.drop("_t_martial", "_t_nutcracker", "_t_work", "_t_local")


def referral_targets(tagged: DataFrame) -> DataFrame:
    """O1: full descending sort — Spark range-partitions the sort keys;
    at scale this is the one global sort in the pipeline."""
    return tagged.orderBy(F.desc("referral_priority_score"),
                          F.desc("confidence_score"))
