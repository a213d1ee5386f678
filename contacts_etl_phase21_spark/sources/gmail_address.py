"""Gmail multi-line street / address-component heuristics.

Parity target: combine_contacts.py:623-812 — the rule cascade that
turns Google's free-form 'Street' cells (often several lines holding
street + city/state/zip + country) into clean components, plus ':::'
variant expansion (598-620).

Pure Python; runs inside the Gmail loader's mapInPandas.
"""

from __future__ import annotations

import re

from contacts_etl_phase21_spark.functions.data import US_STATES
from contacts_etl_phase21_spark.functions.geo import country_iso2
from contacts_etl_phase21_spark.sources.rowparse import split_multi_values

COUNTRY_WORDS = {
    "united states", "united states of america", "usa", "us", "canada",
    "mexico", "united kingdom", "uk", "england", "scotland", "wales",
    "northern ireland",
}

STREET_WORDS = {
    "street", "st", "st.", "road", "rd", "rd.", "avenue", "ave", "ave.",
    "boulevard", "blvd", "blvd.", "lane", "ln", "ln.", "drive", "dr", "dr.",
    "court", "ct", "ct.", "circle", "cir", "cir.", "way", "parkway", "pkwy",
    "pkwy.", "highway", "hwy", "hwy.", "trail", "trl", "trl.", "loop",
    "plaza", "plz", "suite", "ste", "unit", "apt", "apartment", "floor",
    "fl", "building", "bldg", "bldg.",
}

_STATE_CODES = set(US_STATES.values())
_POSTAL = re.compile(r"\b[0-9A-Za-z]{3,10}(?:-[0-9A-Za-z]{3,4})?\b")
_STATE_POSTAL = re.compile(
    r"^\s*([A-Za-z]{2})[\s,]+(\d{3,10}(?:-[0-9A-Za-z]{3,4})?)\s*$")
_CITY_STATE_POSTAL = re.compile(
    r"^\s*(.+?)[,\s]+([A-Za-z]{2})[\s,]+(\d{3,10}(?:-[0-9A-Za-z]{3,4})?)\s*$")


def detect_state(value: str) -> str:
    token = (value or "").strip()
    if not token:
        return ""
    low = token.lower()
    if low in US_STATES:
        return US_STATES[low]
    if len(token) == 2 and token.isalpha() and token.upper() in _STATE_CODES:
        return token.upper()
    return ""


def looks_like_country(value: str) -> bool:
    low = (value or "").strip().lower()
    if not low:
        return False
    if low in COUNTRY_WORDS:
        return True
    mapped = country_iso2(low)
    return bool(mapped) and mapped.lower() != low


def is_street_line(value: str) -> bool:
    text = (value or "").strip()
    if not text:
        return False
    low = text.lower()
    if low in US_STATES or low in _STATE_CODES or low in COUNTRY_WORDS:
        return False
    if _CITY_STATE_POSTAL.match(text):
        return False
    if "," in text and detect_state(text.split(",", 1)[1]):
        return False
    if _POSTAL.fullmatch(text):
        return False
    if looks_like_country(text):
        return False
    if any(ch.isdigit() for ch in text):
        return True
    return any(tok in STREET_WORDS for tok in re.split(r"[\s,]+", low) if tok)


def split_street_lines(value: str) -> list[str]:
    lines: list[str] = []
    for chunk in re.split(r"[\r\n]+", value or ""):
        chunk = chunk.strip()
        if not chunk:
            continue
        lines.extend(split_multi_values(chunk) or [chunk])
    return lines


def _absorb_city_line(city_line: str, comp: dict[str, str]) -> None:
    text = (city_line or "").strip()
    if not text:
        return
    m = _CITY_STATE_POSTAL.match(text)
    if m:
        city, state, postal = m.groups()
        if city:
            comp["city"] = city.strip()
        if state and not comp["state"]:
            detected = detect_state(state)
            if detected:
                comp["state"] = detected
        if postal and not comp["postal_code"]:
            comp["postal_code"] = postal.strip()
        return
    if "," in text and not comp["state"]:
        before, after = text.split(",", 1)
        detected = detect_state(after)
        if detected:
            comp["city"] = before.strip() or comp["city"]
            comp["state"] = detected


def refine_components(comp: dict[str, str]) -> dict[str, str]:
    """Apply the street-line cascade to raw address components.

    Mutating stages: pick the street line, fold extra street-ish lines,
    absorb a city line, then classify leftovers as state/postal/country/
    city in that order.
    """
    comp = {k: (v or "").strip() for k, v in comp.items()}
    lines = split_street_lines(comp["street"])
    if not lines:
        return comp
    redundant = {v.lower() for v in (comp["city"], comp["state"],
                                     comp["postal_code"], comp["country"]) if v}

    replace_street = (not comp["street"] or "\n" in comp["street"]
                      or "\r" in comp["street"])
    remaining = list(lines)
    if replace_street:
        street, street_at = "", None
        for i, cand in enumerate(remaining):
            if cand.lower() in redundant:
                continue
            if is_street_line(cand):
                street, street_at = cand, i
                break
        if street_at is not None:
            remaining = remaining[street_at + 1:]
        else:
            while remaining:
                cand = remaining.pop(0)
                if cand.lower() in redundant:
                    continue
                street = cand
                break
        comp["street"] = street
    else:
        remaining = remaining[1:]

    extra_street, leftovers = [], []
    for cand in remaining:
        if cand.lower() in redundant:
            continue
        (extra_street if is_street_line(cand) else leftovers).append(cand)
    if extra_street:
        comp["street"] = ", ".join(
            p for p in [comp["street"], *extra_street] if p)

    remaining = leftovers
    if remaining and not comp["city"]:
        city_line = remaining.pop(0)
        comp["city"] = city_line
        _absorb_city_line(city_line, comp)

    for line in remaining:
        if not line:
            continue
        m = _STATE_POSTAL.match(line)
        if m:
            state, postal = m.groups()
            if state and not comp["state"]:
                comp["state"] = detect_state(state) or state.strip()
            if postal and not comp["postal_code"]:
                comp["postal_code"] = postal.strip()
            continue
        if not comp["state"]:
            detected = detect_state(line)
            if detected:
                comp["state"] = detected
                continue
        if not comp["postal_code"]:
            pm = _POSTAL.search(line)
            if pm:
                comp["postal_code"] = pm.group(0).strip()
                continue
        if not comp["country"] and country_iso2(line):
            comp["country"] = line.strip()
            continue
        if not comp["city"]:
            comp["city"] = line.strip()
    return comp


def expand_variants(comp: dict[str, str]) -> list[dict[str, str]]:
    """':::' variants across any component zip-expand into N addresses
    (shorter lists pad with their last value)."""
    split = {f: split_multi_values(v) for f, v in comp.items()}
    width = max((len(v) for v in split.values()), default=0)
    if width <= 1:
        return [{f: (v[0] if v else "") for f, v in split.items()}]
    out = []
    for i in range(width):
        out.append({
            f: (v[i] if i < len(v) else v[-1]) if v else ""
            for f, v in split.items()})
    return out
