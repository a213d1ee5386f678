"""State/country canonicalization + address-line heuristics.

Parity targets (reference /root/reference/src/contacts_etl/):
- state_code      ≡ normalize_state (normalization.py:250-256)
- country_iso2    ≡ normalize_country_iso2 (normalization.py:259-263)
- split_embedded_city_state_zip ≡ normalize_address street extraction
  (normalization.py:620-649)
- address_match_keys ≡ address_keys_for_match (normalization.py:912-921)

On Spark, state/country become broadcast-map lookups
(element_at(map, key)); the embedded-address regex maps to
regexp_extract. The pure functions here feed the pandas-UDF path and
unit tests.
"""

from __future__ import annotations

import re

from contacts_etl_phase21_spark.functions.data import COUNTRY_ISO2, US_STATES

_EMBEDDED_ADDR = re.compile(
    r"(.*?)[,\s]+([^,]+?)[,\s]+([A-Za-z]{2})[,\s]+(\d{4,10})(?:[-\s]\d+)?$")


def state_code(value: str | None) -> str:
    v = (value or "").strip()
    if not v:
        return ""
    if len(v) == 2 and v.isalpha():
        return v.upper()
    return US_STATES.get(v.lower(), v.upper())


def country_iso2(value: str | None) -> str:
    v = (value or "").strip()
    if not v:
        return ""
    mapped = COUNTRY_ISO2.get(v.lower())
    if mapped:
        return mapped
    return v.upper() if len(v) == 2 else v


def split_embedded_city_state_zip(street: str) -> tuple[str, str, str, str]:
    """'123 Elm St, Sampleville, MA 02144' → (street, city, state, zip);
    no match → (street, '', '', '')."""
    m = _EMBEDDED_ADDR.search(street or "")
    if not m:
        return street or "", "", "", ""
    return (m.group(1).strip(), m.group(2).strip(),
            m.group(3).strip(), m.group(4).strip())


def address_match_key(city: str, state: str, postal_code: str) -> str | None:
    """ER blocking key for an address: (city, state, postal) lowered;
    usable only when ≥2 components are present."""
    parts = [(city or "").strip().lower(), (state or "").strip().lower(),
             (postal_code or "").strip().lower()]
    if sum(1 for p in parts if p) < 2:
        return None
    return "|".join(parts)
