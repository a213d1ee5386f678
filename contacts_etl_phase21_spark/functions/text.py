"""Text-key folding, email-in-text extraction, vCard unescape, domains.

Behavioral parity targets (reference /root/reference/src/contacts_etl/):
- fold_text          ≡ _norm / normalize_text_key (normalization.py:241-247)
- EMAIL_PATTERN      ≡ EMAIL_RE (normalization.py:39)
- pull_emails        ≡ strip_emails_from_text_and_capture (normalization.py:668-677)
- vcard_unescape     ≡ _unescape_vcard_value (combine_contacts.py:473-485)
- email_domain       ≡ tagging.py:19-28 domain extraction
"""

from __future__ import annotations

import re
import unicodedata

EMAIL_PATTERN = re.compile(r"^[A-Za-z0-9._%+\-']+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}$")
EMAIL_SEARCH = re.compile(r"[A-Za-z0-9._%+\-']+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}")
_WS = re.compile(r"\s+")


def fold_text(value: str | None) -> str:
    """Accent-folded, whitespace-collapsed, lowercase comparison key."""
    s = (value or "").strip()
    if not s:
        return ""
    decomposed = unicodedata.normalize("NFKD", s)
    ascii_ish = "".join(c for c in decomposed if not unicodedata.combining(c))
    return _WS.sub(" ", ascii_ish).lower()


def pull_emails(text: str | None) -> tuple[str, list[str]]:
    """Find email addresses embedded in free text; return (cleaned_text,
    found_emails). Used when names arrive as 'Jane Doe jane@x.com'."""
    if not text:
        return "", []
    found = EMAIL_SEARCH.findall(text)
    cleaned = text
    for address in found:
        cleaned = cleaned.replace(address, "").strip()
    return cleaned, found


_VCARD_ESCAPES = (("\\;", ";"), ("\\,", ","), ("\\n", "\n"),
                  ("\\N", "\n"), ("\\\\", "\\"))


def vcard_unescape(value: str | None) -> str:
    """Undo vCard 3.0 value escaping (ordering matters: \\; before \\\\)."""
    if not value:
        return ""
    out = value
    for escaped, literal in _VCARD_ESCAPES:
        out = out.replace(escaped, literal)
    return out


def email_domain(address: str | None) -> str:
    """Domain part of an email, lowercased ('' if no '@')."""
    s = (address or "").strip().lower()
    if "@" not in s:
        return ""
    return s.rsplit("@", 1)[1]


def pct(numerator: float, denominator: float, digits: int = 2) -> float:
    """Percentage with zero-denominator guard (validate_quality.py:17-18)."""
    if not denominator:
        return 0.0
    return round(100.0 * numerator / denominator, digits)
