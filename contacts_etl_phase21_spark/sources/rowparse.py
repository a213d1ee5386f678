"""Shared pure-Python parsing primitives for the Gmail/vCard loaders.

These run inside Arrow-batched mapInPandas on executors; they are the
per-row "bespoke parsing" tier the built-in CSV/text readers can't
express. Parity refs: combine_contacts.py:363-620 (label parsing,
multi-value splits, first-wins channel maps), 585-595 (email cell
extraction).
"""

from __future__ import annotations

import json
import re

from contacts_etl_phase21_spark.functions.labels import canon_label

_MULTI = re.compile(r":::+")
_CELL_SPLIT = re.compile(r"[\r\n|;]+")


def split_multi_values(raw: str | None) -> list[str]:
    """Google ':::' multi-value cells → trimmed parts."""
    if not raw:
        return []
    return [p.strip() for p in _MULTI.split(raw) if p.strip()]


def extract_email_values(raw: str | None) -> list[str]:
    """Split an email cell on newlines/;/| then ':::'."""
    if not raw:
        return []
    out: list[str] = []
    for part in _CELL_SPLIT.split(raw):
        part = part.strip()
        if not part:
            continue
        out.extend(split_multi_values(part) or [part])
    return [c for c in out if c]


class ChannelMap:
    """Ordered first-wins value→label map with empty-label upgrade —
    the _record_email/_record_phone accumulation semantics."""

    def __init__(self) -> None:
        self._items: dict = {}

    def add(self, key, label: str | None) -> None:
        label_norm = canon_label(label)
        current = self._items.get(key)
        if current is None or (not current and label_norm):
            self._items[key] = label_norm

    def items(self):
        return self._items.items()


class AddressMap:
    """Ordered dedup of addresses on their label-less JSON key; a
    labeled copy displaces an unlabeled one."""

    def __init__(self) -> None:
        self._items: dict[str, dict] = {}

    @staticmethod
    def key_of(addr: dict) -> str:
        payload = {k: v for k, v in addr.items() if k != "label"}
        return json.dumps(payload, sort_keys=True)

    def add(self, addr: dict) -> None:
        key = self.key_of(addr)
        existing = self._items.get(key)
        if existing is None or (not existing.get("label") and addr.get("label")):
            self._items[key] = addr

    def values(self) -> list[dict]:
        return list(self._items.values())


def blank_contact(source: str, row_id: str) -> dict:
    """A CONTACT_SCHEMA-shaped dict with empty defaults."""
    return {
        "source": source, "source_row_id": row_id, "source_timestamp": "",
        "full_name": "", "prefix": "", "first_name": "", "middle_name": "",
        "last_name": "", "maiden_name": "", "suffix": "",
        "suffix_professional": "", "nickname": "", "company": "", "title": "",
        "department": "", "linkedin_url": "", "notes": "",
        "emails": [], "phones": [], "addresses": [],
    }


def email_entry(value: str, label: str) -> dict:
    return {"value": value, "label": label}


def phone_entry(value: str, label: str, extension: str = "") -> dict:
    return {"value": value, "label": label, "extension": extension}


def address_entry(po_box="", extended="", street="", city="", state="",
                  postal_code="", country="", label="") -> dict:
    return {"po_box": po_box, "extended": extended, "street": street,
            "city": city, "state": state, "postal_code": postal_code,
            "country": country, "label": label}
