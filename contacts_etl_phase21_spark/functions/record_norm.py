"""Per-record normalization cascade (SURVEY.md §2.5 N1-N5), pure core.

One record dict in (schemas.CONTACT_SCHEMA shape), one normalized record
out, plus the invalid-email / non-standard-phone side lists. The Spark
operator (operators/normalize.py) maps this over Arrow batches with
mapInPandas; tests call it directly.

Parity target: normalize_contact_record + the collection normalizers
(reference normalization.py:543-665,783-909).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from contacts_etl_phase21_spark.functions.data import (
    GENERATIONAL_SUFFIXES, HONORIFIC_PREFIXES, PROFESSIONAL_SUFFIXES,
)
from contacts_etl_phase21_spark.functions.emails import clean_email
from contacts_etl_phase21_spark.functions.geo import (
    country_iso2, split_embedded_city_state_zip, state_code,
)
from contacts_etl_phase21_spark.functions.labels import canon_label
from contacts_etl_phase21_spark.functions.names import (
    guess_from_email_local, initial_from_email, parse_full_name,
)
from contacts_etl_phase21_spark.functions.phones import (
    phone_is_valid, phone_to_e164, render_with_extension,
)
from contacts_etl_phase21_spark.functions.text import EMAIL_PATTERN, pull_emails


@dataclass(frozen=True)
class NormSettings:
    """Knobs of the reference's NormalizationSettings that change behavior."""

    default_phone_country: str = "US"
    drop_invalid_emails: bool = False
    drop_invalid_phones: bool = False
    email_dns_mx_check: bool = False
    # name-parser token sets (reference config_loader.py:96-105 feeds
    # these from config.yaml normalization:); defaults mirror the
    # reference's shipped config.yaml lists
    generational_suffixes: frozenset[str] = GENERATIONAL_SUFFIXES
    professional_suffixes: frozenset[str] = PROFESSIONAL_SUFFIXES
    name_prefixes: frozenset[str] = HONORIFIC_PREFIXES


def _first_valid_email(emails: list[dict]) -> str:
    for email in emails:
        value = email.get("value") or ""
        if EMAIL_PATTERN.match(value):
            return value
    return ""


def normalize_emails(emails: list[dict],
                     drop_invalid: bool = False) -> tuple[list[dict], list[str]]:
    """Validate + dedupe-on-normalized-value, first occurrence wins but an
    empty label upgrades; invalid values keep label 'invalid'."""
    email_map: dict[str, str] = {}
    invalid: list[str] = []
    kept_invalid: dict[str, str] = {}
    for entry in emails:
        normalized = clean_email(entry.get("value"))
        if not normalized:
            raw = (entry.get("value") or "").strip()
            if not raw:
                continue
            invalid.append(raw)
            if not drop_invalid:
                kept_invalid.setdefault(raw.lower(), raw)
            continue
        candidate_label = canon_label(entry.get("label"))
        current = email_map.get(normalized)
        if current is None or (not current and candidate_label):
            email_map[normalized] = candidate_label
    out = [{"value": v, "label": l} for v, l in email_map.items()]
    if not drop_invalid:
        out.extend({"value": v, "label": "invalid"}
                   for v in kept_invalid.values())
    return out, invalid


def normalize_phones(phones: list[dict], default_country: str = "US",
                     drop_invalid: bool = False) -> tuple[list[dict], list[str]]:
    """E.164 with compact retry; dedupe on (value, extension); invalid
    kept labeled 'invalid' and rendered 'valuexEXT::invalid' in the side
    list."""
    out: list[dict] = []
    seen: set[tuple[str, str]] = set()
    non_standard: list[str] = []
    non_standard_seen: set[str] = set()
    kept_invalid: list[tuple[str, str]] = []
    for entry in phones:
        raw = entry.get("value") or ""
        extension = entry.get("extension") or ""
        formatted = phone_to_e164(raw, default_country)
        confident = bool(formatted and phone_is_valid(formatted))
        if not confident:
            compact = re.sub(r"\s+", "", raw)
            if compact and compact != raw:
                retry = phone_to_e164(compact, default_country)
                if retry and phone_is_valid(retry):
                    formatted, confident = retry, True
        if confident and formatted:
            key = (formatted, extension)
            if key in seen:
                continue
            seen.add(key)
            out.append({"value": formatted, "label": entry.get("label") or "",
                        "extension": extension})
        else:
            trimmed = raw.strip()
            if not trimmed:
                continue
            rendered = f"{render_with_extension(trimmed, extension)}::invalid"
            if rendered in non_standard_seen:
                continue
            non_standard_seen.add(rendered)
            non_standard.append(rendered)
            if not drop_invalid:
                kept_invalid.append((trimmed, extension))
    if not drop_invalid:
        out.extend({"value": v, "label": "invalid", "extension": e}
                   for v, e in kept_invalid)
    return out, non_standard


def normalize_address(addr: dict) -> dict:
    """State/country canonicalization + embedded 'street, city, ST zip'
    extraction when components are missing."""
    street = addr.get("street") or ""
    city = addr.get("city") or ""
    state = addr.get("state") or ""
    postal = addr.get("postal_code") or ""
    if street and (not city or not state or not postal):
        s2, city_guess, state_guess, postal_guess = \
            split_embedded_city_state_zip(street)
        if city_guess or state_guess or postal_guess:
            street = s2
        city = city or city_guess
        state = state or state_guess
        postal = postal or postal_guess
    return {
        "po_box": addr.get("po_box") or "",
        "extended": addr.get("extended") or "",
        "street": street.strip(),
        "city": city.strip(),
        "state": state_code(state),
        "postal_code": postal.strip(),
        "country": country_iso2(addr.get("country")),
        "label": canon_label(addr.get("label")),
    }


def normalize_addresses(addresses: list[dict]) -> list[dict]:
    """Normalize each address; dedupe on the label-less JSON key keeping
    the labeled copy."""
    normalized: dict[str, dict] = {}
    for entry in addresses:
        addr = normalize_address(entry)
        payload = {k: v for k, v in addr.items() if k != "label"}
        key = json.dumps(payload, sort_keys=True)
        existing = normalized.get(key)
        if existing is not None:
            if not existing["label"] and addr["label"]:
                normalized[key] = addr
        else:
            normalized[key] = addr
    return list(normalized.values())


def normalize_record(rec: dict,
                     settings: NormSettings = NormSettings()) -> dict:
    """The N1 cascade: name parse → email-in-name capture → email-local
    name inference → channel collection normalization."""
    out = dict(rec)
    emails = [dict(e) for e in rec.get("emails") or []]
    phones = [dict(p) for p in rec.get("phones") or []]
    addresses = [dict(a) for a in rec.get("addresses") or []]

    # 1. Pull emails embedded in the display name, then parse it.
    raw_name, captured = pull_emails(rec.get("full_name") or "")
    parsed = parse_full_name(raw_name, settings.generational_suffixes,
                             settings.professional_suffixes,
                             settings.name_prefixes)
    existing_values = {e.get("value") for e in emails}
    emails.extend({"value": v, "label": ""} for v in captured
                  if v and v not in existing_values)

    out["prefix"] = rec.get("prefix") or parsed.prefix
    first, middle, last = parsed.first, parsed.middle, parsed.last
    gen_suffix = parsed.generational
    full_name_clean = parsed.clean_full

    # 2. Nameless record → infer (first, last) from the first valid
    # email's local part.
    if not (first or last):
        primary = _first_valid_email(emails)
        if primary:
            f_guess, l_guess = guess_from_email_local(primary.split("@", 1)[0])
            first = first or f_guess
            last = last or l_guess
            full_name_clean = " ".join(p for p in [
                out["prefix"], first, middle, last, gen_suffix] if p).strip()

    out["first_name"] = first or rec.get("first_name") or ""
    out["middle_name"] = middle or rec.get("middle_name") or ""
    out["last_name"] = last or rec.get("last_name") or ""
    out["maiden_name"] = parsed.maiden or rec.get("maiden_name") or ""
    out["suffix"] = rec.get("suffix") or gen_suffix
    out["suffix_professional"] = (rec.get("suffix_professional")
                                  or "|".join(parsed.professional))
    out["full_name"] = full_name_clean or rec.get("full_name") or ""

    # 3. Emails hiding inside name parts move to the email list.
    for part in ("first_name", "middle_name", "last_name"):
        cleaned, found = pull_emails(out[part])
        if found:
            out[part] = cleaned
            known = {e.get("value") for e in emails}
            emails.extend({"value": v, "label": ""} for v in found
                          if v not in known)
    for part in ("first_name", "last_name"):
        value = (out[part] or "").strip()
        if value and EMAIL_PATTERN.match(value):
            emails.append({"value": value, "label": ""})
            out[part] = ""

    # 4. Second inference pass after the moves above.
    if not (out["first_name"] or out["last_name"]):
        primary = _first_valid_email(emails)
        if primary:
            f_guess, l_guess = guess_from_email_local(primary.split("@", 1)[0])
            out["last_name"] = out["last_name"] or l_guess
            out["first_name"] = out["first_name"] or f_guess
    if out["last_name"] and not out["first_name"]:
        primary = _first_valid_email(emails)
        if primary:
            initial = initial_from_email(primary.split("@", 1)[0],
                                         out["last_name"])
            if initial:
                out["first_name"] = initial

    out["full_name"] = " ".join(p for p in [
        out["prefix"], out["first_name"], out["middle_name"],
        out["last_name"], out["suffix"]] if p).strip()

    out["emails"], invalid_emails = normalize_emails(
        emails, settings.drop_invalid_emails)
    out["phones"], non_standard = normalize_phones(
        phones, settings.default_phone_country, settings.drop_invalid_phones)
    out["addresses"] = normalize_addresses(addresses)
    out["invalid_emails"] = invalid_emails
    out["non_standard_phones"] = non_standard
    return out
