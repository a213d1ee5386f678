"""Deterministic ids and timestamps.

- stable_uuid ≡ deterministic_uuid (reference common.py:72-74): UUIDv5
  (SHA-1) under a fixed namespace, so re-runs produce identical
  contact_ids.
- parse_when ≡ _parse_timestamp (combine_contacts.py:229-236) +
  LinkedIn's 'Connected On' format (325-336).
"""

from __future__ import annotations

import uuid
from datetime import datetime

from dateutil import parser as dateparser

# Fixed namespace: ids must be stable across runs AND across engines —
# the same constant the reference pipeline hashes under (common.py:72-74),
# so a user switching engines keeps identical contact_ids.
_NAMESPACE = uuid.UUID("12345678-1234-5678-1234-567812345678")


def stable_uuid(key_material: str) -> str:
    return str(uuid.uuid5(_NAMESPACE, key_material))


def parse_when(value: str | None) -> datetime | None:
    """Tolerant timestamp parse; None for empty/garbage."""
    text = (value or "").strip()
    if not text:
        return None
    try:
        return dateparser.parse(text)
    except (ValueError, TypeError, OverflowError):
        return None


def parse_linkedin_date(value: str | None) -> datetime | None:
    """LinkedIn 'Connected On': '%d %b %Y' first, then tolerant parse."""
    text = (value or "").strip()
    if not text:
        return None
    try:
        return datetime.strptime(text, "%d %b %Y")
    except ValueError:
        return parse_when(text)
