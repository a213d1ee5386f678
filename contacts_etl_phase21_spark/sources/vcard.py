"""macOS vCard 3.0 → typed contact rows.

Parity: _load_vcards (combine_contacts.py:931-1096). No built-in vCard
reader exists — this is genuine custom-source territory (SURVEY.md S4):
spark.read.text with lineSep='END:VCARD' splits the file into blocks
without materializing it on the driver; a pure-Python block parser runs
under mapInPandas.

Sequential-order semantics preserved: labels referencing company/title
('work' upgrade) are resolved in line order like the reference, so a
late ORG does not retroactively relabel an earlier EMAIL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from contacts_etl_phase21_spark.functions.labels import (
    apple_label, vcard_type_tokens,
)
from contacts_etl_phase21_spark.functions.phones import split_extension
from contacts_etl_phase21_spark.functions.text import vcard_unescape
from contacts_etl_phase21_spark.schemas import CONTACT_SCHEMA
from contacts_etl_phase21_spark.sources.rowparse import (
    AddressMap, ChannelMap, blank_contact,
)

_EMAIL_LABEL_ORDER = ("work", "home", "other")
_PHONE_LABEL_ORDER = ("mobile", "cell", "iphone", "work", "home", "main",
                      "fax", "pager", "other", "voice")
_ADDR_LABEL_ORDER = ("work", "home", "other")


def _pick_label(tokens: list[str], order: tuple[str, ...],
                item_key: str, item_labels: dict[str, str]) -> str:
    for preferred in order:
        if preferred in tokens:
            return preferred
    if tokens:
        return tokens[0]
    if item_key and item_key in item_labels:
        return item_labels[item_key]
    return ""


def parse_vcard_block(block: str, row_id: str) -> dict:
    """One BEGIN:VCARD…END:VCARD block → CONTACT_SCHEMA dict."""
    rec = blank_contact("mac_vcf", row_id)
    emails = ChannelMap()
    phones = ChannelMap()
    addresses = AddressMap()
    item_labels: dict[str, str] = {}

    for raw_line in block.splitlines():
        line = raw_line.strip()
        if not line:
            continue
        header, _, value = line.partition(":")
        if not _:
            header, value = line, ""
        item_key = ""
        if "." in header:
            maybe_item, rest = header.split(".", 1)
            if maybe_item.lower().startswith("item"):
                item_key, header = maybe_item.lower(), rest
        hu = header.upper()
        # exact property name (reference uses prefix matching, which
        # mis-routes NOTE: lines into the N: handler and clobbers
        # last_name — combine_contacts.py:976; deliberate fix here)
        prop = hu.split(";", 1)[0]
        params = header.split(";")[1:]

        if prop == "X-ABLABEL":
            if item_key:
                item_labels[item_key] = apple_label(value)
        elif prop == "FN":
            rec["full_name"] = value.strip()
        elif prop == "NICKNAME" and value:
            rec["nickname"] = value.strip()
        elif prop == "N":
            comp = value.split(";")
            rec["last_name"] = comp[0].strip() if len(comp) > 0 else ""
            rec["first_name"] = comp[1].strip() if len(comp) > 1 else ""
            rec["middle_name"] = comp[2].strip() if len(comp) > 2 else ""
            rec["prefix"] = comp[3].strip() if len(comp) > 3 else ""
            rec["suffix"] = comp[4].strip() if len(comp) > 4 else ""
            if not rec["full_name"]:
                rec["full_name"] = " ".join(filter(None, [
                    rec["prefix"], rec["first_name"], rec["middle_name"],
                    rec["last_name"], rec["suffix"]])).strip()
        elif prop == "REV" and value:
            rec["source_timestamp"] = value.strip()
        elif prop == "EMAIL" and value:
            tokens = vcard_type_tokens(params)
            label = _pick_label(tokens, _EMAIL_LABEL_ORDER, item_key, item_labels)
            if (not label or label == "other") and (rec["company"] or rec["title"]):
                label = "work"
            emails.add(value, label or "other")
        elif prop == "TEL" and value:
            tokens = vcard_type_tokens(params)
            label = _pick_label(tokens, _PHONE_LABEL_ORDER, item_key, item_labels)
            base, ext = split_extension(vcard_unescape(value).strip())
            phones.add((base, ext), label or "other")
        elif prop == "ADR" and value:
            tokens = vcard_type_tokens(params)
            label = _pick_label(tokens, _ADDR_LABEL_ORDER, item_key, item_labels)
            parts = value.split(";")

            def part(i: int) -> str:
                return parts[i].strip() if len(parts) > i else ""

            addresses.add({
                "po_box": part(0), "extended": part(1), "street": part(2),
                "city": part(3), "state": part(4), "postal_code": part(5),
                "country": part(6), "label": label or "other"})
        elif prop == "ORG" and value:
            comp = vcard_unescape(value.strip()).split(";")
            rec["company"] = comp[0].strip() if comp else ""
            dept = [p.strip() for p in comp[1:] if p.strip()]
            if dept:
                rec["department"] = ", ".join(dept)
        elif prop == "TITLE" and value:
            rec["title"] = vcard_unescape(value.strip())
        elif prop == "URL" and value and "linkedin.com" in value.lower():
            rec["linkedin_url"] = value.strip()
        elif prop == "NOTE" and value:
            rec["notes"] = value.strip()

    rec["emails"] = [{"value": v, "label": lb} for v, lb in emails.items()]
    rec["phones"] = [{"value": v, "extension": e, "label": lb}
                     for (v, e), lb in phones.items()]
    rec["addresses"] = addresses.values()
    return rec


def load_vcards(spark: SparkSession, path: str) -> DataFrame:
    """text scan split on END:VCARD → file-order row ids (per-file
    windows + offsets, multi-file safe — io.with_file_order_ids, r05;
    was a global single-task orderBy window) → mapInPandas parse
    spread across all cores."""
    from contacts_etl_phase21_spark.io import with_file_order_ids

    blocks = spark.read.option("lineSep", "END:VCARD").text(path)
    ordered = (
        with_file_order_ids(
            blocks.filter(F.col("value").contains("BEGIN:VCARD")),
            "row_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([
                parse_vcard_block(block, rid)
                for block, rid in zip(pdf["value"], pdf["row_id"])])

    return ordered.mapInPandas(run, CONTACT_SCHEMA)
