"""Email validation/normalization.

Parity target: validate_email_safe (reference normalization.py:266-279).
Uses the `email_validator` package when importable (it is optional in
this container); otherwise the documented fallback: strip spaces,
lowercase, accept iff it matches the address regex.
"""

from __future__ import annotations

try:  # optional dependency — reference has the same import-try shape
    from email_validator import EmailNotValidError, validate_email

    _HAS_VALIDATOR = True
except ImportError:  # pragma: no cover
    _HAS_VALIDATOR = False

from contacts_etl_phase21_spark.functions.text import EMAIL_PATTERN


def clean_email(raw: str | None, check_deliverability: bool = False) -> str:
    """Normalized address, or '' when invalid."""
    candidate = (raw or "").strip()
    if not candidate:
        return ""
    if _HAS_VALIDATOR:
        try:
            return validate_email(
                candidate, check_deliverability=check_deliverability).normalized
        except EmailNotValidError:
            return ""
    compact = candidate.replace(" ", "").lower()
    return compact if EMAIL_PATTERN.match(compact) else ""
