"""Phone validation, E.164 formatting, extension handling.

Parity targets (reference /root/reference/src/contacts_etl/):
- phone_is_valid     ≡ is_valid_phone_safe (normalization.py:282-294)
- phone_to_e164      ≡ format_phone_e164_safe (normalization.py:297-327)
- split_extension    ≡ _strip_phone_extension (combine_contacts.py:488-506)
- attach_orphan_extensions ≡ _merge_phone_extensions (combine_contacts.py:508-526)
- extract_phone_values ≡ _extract_phone_values (combine_contacts.py:339-360)
- render_with_extension ≡ _format_phone_with_extension

`phonenumbers` is optional (absent in this container); the fallback
branch implements the reference's documented digit-count heuristics.
"""

from __future__ import annotations

import re

try:  # optional dependency, same import-try shape as the reference
    import phonenumbers

    _HAS_PHONENUMBERS = True
except ImportError:  # pragma: no cover
    phonenumbers = None
    _HAS_PHONENUMBERS = False

_NON_DIGIT = re.compile(r"\D")
_PHONE_TOKEN = re.compile(r"\+?\d[\d\s()./-]{6,}\d")
_MULTI_VALUE = re.compile(r":::+")
_BARE_EXTENSION = re.compile(r"^(?:ext\.?|extension|x)?\s*(\d{1,6})$", re.IGNORECASE)
_TRAILING_EXTENSION = re.compile(
    r"^(?P<number>.+?)(?:[\s,;/]*(?:ext\.?|extension|x)\s*(?P<ext>\d{1,6})"
    r"|p(?P<ext2>\d{1,6})#)\s*$",
    re.IGNORECASE,
)


def _digits(s: str) -> str:
    return _NON_DIGIT.sub("", s)


def phone_is_valid(value: str | None) -> bool:
    s = (value or "").strip()
    if not s:
        return False
    if _HAS_PHONENUMBERS:
        try:
            parsed = phonenumbers.parse(s, None if s.startswith("+") else "US")
            return (phonenumbers.is_possible_number(parsed)
                    and phonenumbers.is_valid_number(parsed))
        except Exception:
            return False
    return s.startswith("+") and len(_digits(s)) >= 11


def phone_to_e164(value: str | None, default_country: str = "US") -> str:
    """Best-effort E.164. Fallback ladder: 10 digits → +1, 11 with
    leading 1 → +, 12-15 digits → +digits, '+...' → keep digits,
    otherwise +1+digits; never returns '' for non-empty input."""
    s = (value or "").strip()
    if not s:
        return ""
    result = ""
    if _HAS_PHONENUMBERS:
        try:
            region = None if s.startswith("+") else default_country
            candidate = s
            if region and len(_digits(s)) > 10 and not s.startswith("+"):
                candidate, region = f"+{_digits(s)}", None
            parsed = phonenumbers.parse(candidate, region)
            result = phonenumbers.format_number(
                parsed, phonenumbers.PhoneNumberFormat.E164)
        except Exception:
            result = ""
    if not result:
        d = _digits(s)
        if len(d) == 10:
            result = f"+1{d}"
        elif len(d) == 11 and d.startswith("1"):
            result = f"+{d}"
        elif 11 < len(d) <= 15 and not s.startswith("+"):
            result = f"+{d}"
        elif s.startswith("+"):
            result = re.sub(r"[^\d+]", "", s)
        else:
            result = f"+1{d}" if d else ""
    return result or s


def render_with_extension(value: str, extension: str | None) -> str:
    ext = (extension or "").strip()
    return f"{value}x{ext}" if ext else value


def split_extension(segment: str) -> tuple[str, str]:
    """Peel a trailing extension: ';1234', 'ext 12', 'x99', 'p77#'."""
    seg = (segment or "").strip()
    if ";" in seg:
        head, tail = seg.rsplit(";", 1)
        tail = tail.strip()
        if tail.isdigit() and 1 <= len(tail) <= 6:
            return head.strip(), tail
    m = _TRAILING_EXTENSION.match(seg)
    if m:
        ext = m.group("ext") or m.group("ext2")
        if ext:
            number = (m.group("number") or "").strip(" ,;/")
            if number:
                return number, ext.strip()
    return seg, ""


def attach_orphan_extensions(
        pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """A bare 'ext 12' token following a number attaches to it."""
    merged: list[tuple[str, str]] = []
    for value, ext in pairs:
        value = (value or "").strip()
        ext = (ext or "").strip()
        if not value:
            if ext and merged and not merged[-1][1]:
                merged[-1] = (merged[-1][0], ext)
            continue
        bare = _BARE_EXTENSION.match(value)
        if not ext and bare and merged and not merged[-1][1]:
            merged[-1] = (merged[-1][0], bare.group(1))
            continue
        merged.append((value, ext))
    return merged


def extract_phone_values(raw: str | None) -> list[tuple[str, str]]:
    """Split a raw multi-phone cell into (number, extension) pairs.

    Splits on newlines/;/| and Google's ':::' separator, regex-finds
    phone-shaped tokens, attaches trailing + orphan extensions.
    """
    if not raw:
        return []
    found: list[tuple[str, str]] = []
    for chunk in re.split(r"[\r\n|;]+", raw):
        chunk = chunk.strip()
        if not chunk:
            continue
        pieces = [p.strip() for p in _MULTI_VALUE.split(chunk) if p.strip()] or [chunk]
        for piece in pieces:
            base, inline_ext = split_extension(piece)
            tokens = _PHONE_TOKEN.findall(base)
            if tokens:
                for i, token in enumerate(tokens):
                    found.append(
                        (token.strip(),
                         inline_ext if (inline_ext and i == len(tokens) - 1) else ""))
            elif base.strip():
                found.append((base.strip(), inline_ext))
    return attach_orphan_extensions([p for p in found if p[0]])
