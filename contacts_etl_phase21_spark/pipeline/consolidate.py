"""Stage 1 — consolidate: sources → normalized → resolved → merged.

The reference's contacts-consolidate CLI (combine_contacts.py:1429-1574)
as one declarative DataFrame program:

    raw (S2-S5 union) → normalize_records (N1-N5)
    → prepare/pair/score/decide/components (E1-E5)
    → merge_clusters (E6-E9) → lineage (E10) → flattened pivot (P2)

Everything downstream of the sources is a transformation on cached
DataFrames; stages exchange typed Parquet (io/sinks), never CSV.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from contacts_etl_phase21_spark.operators.entity_resolution import (
    build_lineage, cluster_records, merge_clusters, prepare_for_matching,
)
from contacts_etl_phase21_spark.io import widen
from contacts_etl_phase21_spark.operators.normalize import normalize_records
from contacts_etl_phase21_spark.pipeline.config import PipelineConfig


@dataclass
class ConsolidateResult:
    contacts: DataFrame      # CONSOLIDATED_SCHEMA + cluster_id
    lineage: DataFrame       # LINEAGE_SCHEMA
    flattened: DataFrame     # P2 pivot
    clustered: DataFrame     # normalized records + cluster_id (debug/bench)


def consolidate_records(raw: DataFrame,
                        config: PipelineConfig = PipelineConfig(),
                        mx_checker=None) -> ConsolidateResult:
    """raw CONTACT_SCHEMA records → consolidated contacts + lineage +
    flattened. Caches the clustered records — they feed both the merge
    and the lineage join.

    When config normalization.email_dns_mx_check is on, merged contacts
    get the E11 post-merge deliverability pass (reference
    combine_contacts.py:1453-1455) before flattening/export;
    `mx_checker` injects a deterministic checker for tests.

    raw is widened first (r11, guide §2.5/§4): every stage below —
    the normalize/prepare Arrow-UDF chains and the quadratic pair
    scoring — inherits the INPUT's partitioning, and a single-row-
    group local source scans as ONE task, serializing the whole
    Python boundary (profiled: the pair-scoring localCheckpoint
    stages ran 2-4 tasks with run≫cpu — Python wait — on 32 cores).
    widen no-ops on an already-wide input (the 100 TB case) and every
    derived column (rid included — a pure function of source +
    source_row_id) is row-local, so the output is partition-
    independent."""
    normalized = normalize_records(widen(raw), config.normalization)
    clustered = cluster_records(
        prepare_for_matching(normalized), config.dedupe).cache()
    contacts = merge_clusters(clustered, config.dedupe)
    if config.normalization.email_dns_mx_check:
        from contacts_etl_phase21_spark.operators.mx_check import \
            apply_mx_check

        contacts = apply_mx_check(contacts, mx_checker)
    contacts = contacts.cache()
    lineage = build_lineage(clustered, contacts, raw)
    return ConsolidateResult(
        contacts=contacts,
        lineage=lineage,
        flattened=flatten_contacts(contacts),
        clustered=clustered,
    )


# ---------------------------------------------------------------------------
# P2: flattened home/work/other pivot — pure higher-order-function columns.
# ---------------------------------------------------------------------------

_LABELS = ("home", "work", "other")


def _first_labeled(arr: F.Column | str, label: str) -> F.Column:
    # F.get is null-safe on empty arrays (ANSI mode makes element_at throw)
    return F.get(F.filter(arr, lambda x: x["label"] == label), 0)


def _addr_display(a: F.Column) -> F.Column:
    """'street, city, ST, zip, CC' skipping blanks
    (combine_contacts.py:527-537)."""
    return F.concat_ws(", ", *[
        F.nullif(a[f], F.lit("")) for f in
        ("street", "city", "state", "postal_code", "country")])


def flatten_contacts(contacts: DataFrame) -> DataFrame:
    """First valid email/phone/address per {home,work,other} label
    (combine_contacts.py:1488-1514) — no shuffle, one projection."""
    valid_emails = F.filter(
        "emails", lambda e: (e["label"] != "") & (e["label"] != "invalid"))
    valid_phones = F.filter(
        "phones", lambda p: (p["label"] != "") & (p["label"] != "invalid"))
    valid_addresses = F.filter("addresses", lambda a: a["label"] != "")
    out = contacts.select(
        "contact_id", "full_name", "company", "department", "title",
        "linkedin_url",
        valid_emails.alias("_ve"), valid_phones.alias("_vp"),
        valid_addresses.alias("_va"))
    for label in _LABELS:
        email = _first_labeled("_ve", label)
        phone = _first_labeled("_vp", label)
        addr = _first_labeled("_va", label)
        out = (
            out
            .withColumn(f"{label}_email",
                        F.coalesce(email["value"], F.lit("")))
            .withColumn(f"{label}_phone", F.coalesce(
                F.when(phone["extension"] != "",
                       F.concat(phone["value"], F.lit("x"),
                                phone["extension"]))
                .otherwise(phone["value"]), F.lit("")))
            .withColumn(f"{label}_address",
                        F.coalesce(_addr_display(addr), F.lit("")))
        )
    return out.drop("_ve", "_vp", "_va")


def duplicate_contact_ids(contacts: DataFrame) -> DataFrame:
    """P5 guard (combine_contacts.py:1519-1525): non-empty result ⇒ the
    pipeline must abort."""
    return contacts.groupBy("contact_id").count().filter(F.col("count") > 1)


def assert_unique_contact_ids(contacts: DataFrame) -> None:
    dupes = duplicate_contact_ids(contacts).limit(5).collect()
    if dupes:
        raise ValueError(
            f"duplicate contact ids in output: {[r['contact_id'] for r in dupes]}")
