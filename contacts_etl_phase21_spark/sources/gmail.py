"""Gmail contacts CSV → typed contact rows.

Parity: _load_gmail_csv (combine_contacts.py:815-928). The export has
dynamic repeated column families ('E-mail N - Value/Label', 'Phone N',
'Address N - <7 components> + Label'); N is discovered from df.columns
at plan-build time (driver), and the per-row assembly (multi-value
splits, label parsing, extension extraction, street heuristics) runs
as one Arrow-batched mapInPandas — the bespoke-parse tier.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from contacts_etl_phase21_spark.functions.labels import gmail_label
from contacts_etl_phase21_spark.functions.phones import extract_phone_values
from contacts_etl_phase21_spark.schemas import CONTACT_SCHEMA
from contacts_etl_phase21_spark.sources.gmail_address import (
    expand_variants, refine_components,
)
from contacts_etl_phase21_spark.sources.rowparse import (
    AddressMap, ChannelMap, blank_contact, extract_email_values,
)

_ADDR_COMPONENTS = {
    "po_box": "PO Box", "extended": "Extended Address", "street": "Street",
    "city": "City", "state": "Region", "postal_code": "Postal Code",
    "country": "Country",
}


def _get(row: pd.Series, col: str) -> str:
    v = row.get(col)
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return ""
    return str(v).strip()


def parse_gmail_row(row: pd.Series, row_id: str, columns: list[str]) -> dict:
    """One CSV row → CONTACT_SCHEMA dict (pure Python)."""
    rec = blank_contact("gmail", row_id)

    emails = ChannelMap()
    for col in columns:
        if not (col.startswith("E-mail ") and col.endswith(" - Value")):
            continue
        raw = _get(row, col)
        if not raw:
            continue
        label, _pref = gmail_label(
            _get(row, col.replace(" - Value", " - Label")), "email")
        label = label or "other"
        for value in extract_email_values(raw):
            emails.add(value, label)
    rec["emails"] = [{"value": v, "label": lb} for v, lb in emails.items()]

    phones = ChannelMap()
    for col in columns:
        if not (col.startswith("Phone ") and col.endswith(" - Value")):
            continue
        raw = _get(row, col)
        if not raw:
            continue
        label, _pref = gmail_label(
            _get(row, col.replace(" - Value", " - Label")), "phone")
        label = label or "other"
        for value, ext in extract_phone_values(raw):
            phones.add((value, ext), label)
    rec["phones"] = [{"value": v, "extension": e, "label": lb}
                     for (v, e), lb in phones.items()]

    addr_ids = sorted(
        {m.group(1) for c in columns
         if (m := re.match(r"Address (\d+) - ", c))},
        key=int)
    addresses = AddressMap()
    for addr_id in addr_ids:
        label, _pref = gmail_label(
            _get(row, f"Address {addr_id} - Label"), "address")
        label = label or "other"
        comp = {field: _get(row, f"Address {addr_id} - {suffix}")
                for field, suffix in _ADDR_COMPONENTS.items()}
        comp = refine_components(comp)
        for variant in expand_variants(comp):
            entry = {**variant, "label": label}
            if any(entry.get(f) for f in ("street", "city", "state",
                                          "postal_code", "country", "po_box")):
                addresses.add(entry)
    rec["addresses"] = addresses.values()

    first = _get(row, "First Name")
    middle = _get(row, "Middle Name")
    last = _get(row, "Last Name")
    prefix = _get(row, "Name Prefix")
    suffix = _get(row, "Name Suffix")
    rec["full_name"] = " ".join(
        p for p in (prefix, first, middle, last, suffix) if p).strip()
    rec["prefix"] = prefix
    rec["suffix"] = suffix
    rec["nickname"] = _get(row, "Nickname")
    rec["company"] = _get(row, "Organization Name")
    rec["title"] = _get(row, "Organization Title")
    rec["department"] = _get(row, "Organization Department")
    rec["notes"] = _get(row, "Notes")
    return rec


def load_gmail(spark: SparkSession, path: str) -> DataFrame:
    """csv scan (all-string, header) → mapInPandas(parse) → typed rows.

    Row ids are assigned from the file-order position so lineage and
    the notes join match the reference's indices. r05: ids come from
    io.with_file_order_ids — per-file windows + cumulative offsets —
    so a multi-file drop directory numbers files in parallel instead
    of funneling through the old coalesce(1) single task; single-file
    ids are unchanged (parity gate green). The rows are then spread so
    the per-row Python parse runs on every core.
    """
    from contacts_etl_phase21_spark.io import with_file_order_ids

    raw = spark.read.option("header", True).option("multiLine", True) \
        .option("escape", '"').csv(path)
    columns = raw.columns
    sc = spark.sparkContext
    with_ids = with_file_order_ids(raw, "__row_id") \
        .repartition(sc.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([
                parse_gmail_row(row, row["__row_id"], columns)
                for _, row in pdf.iterrows()])

    return with_ids.mapInPandas(run, CONTACT_SCHEMA)
