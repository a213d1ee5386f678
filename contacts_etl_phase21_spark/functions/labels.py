"""Channel label canonicalization + survivorship rank lattice.

Parity targets (reference /root/reference/src/contacts_etl/combine_contacts.py):
- canon_label        ≡ _normalize_label (363-365)
- gmail_label        ≡ _parse_gmail_label (371-393)
- apple_label        ≡ _normalize_apple_label (460-470)
- vcard_type_tokens  ≡ _extract_type_tokens (425-450)
- rank_is_better / should_replace_label ≡ 207-261 — the tie-break
  lattice survivorship encodes into an orderable struct on Spark.
"""

from __future__ import annotations

import re
from datetime import datetime

from contacts_etl_phase21_spark.functions.data import APPLE_LABELS, SOURCE_PRIORITY

_APPLE_TOKEN = re.compile(r"_\$!<(.+?)>!\$_", re.IGNORECASE)
_MOBILE_HINTS = ("mobile", "cell", "iphone")

Rank = tuple[datetime | None, int]


def canon_label(label: str | None) -> str:
    return (label or "").strip().lower()


def gmail_label(raw: str | None, channel: str) -> tuple[str, bool]:
    """Gmail label → (canonical, is_preferred). '*'-prefix marks
    preferred; mobile/cell/iphone → mobile (phones); work/home/other
    contains-match; any other non-empty label folds to 'other'."""
    label = (raw or "").strip()
    preferred = label.startswith("*")
    if preferred:
        label = label.lstrip("*").strip()
    low = label.lower()
    if channel == "phone" and any(h in low for h in _MOBILE_HINTS):
        return "mobile", preferred
    for needle in ("work", "home", "other"):
        if needle in low:
            return needle, preferred
    return ("other", preferred) if low else ("", preferred)


def apple_label(raw: str | None) -> str:
    """'_$!<Work>!$_' → 'work'; unknown tokens pass through lowered."""
    s = (raw or "").strip()
    if not s:
        return ""
    low = s.lower()
    if low in APPLE_LABELS:
        return APPLE_LABELS[low]
    m = _APPLE_TOKEN.match(s)
    if m:
        return m.group(1).strip().lower()
    return low


def vcard_type_tokens(params: list[str]) -> list[str]:
    """TYPE= params → label tokens; drops pref/internet, strips 'x-'."""
    raw: list[str] = []
    for param in params:
        if not param:
            continue
        if "=" in param:
            key, value = param.split("=", 1)
            if key.strip().lower() == "type":
                raw.extend(t.strip().lower()
                           for t in re.split(r"[;,]", value) if t.strip())
        else:
            raw.extend(t.strip().lower() for t in param.split(",") if t.strip())
    out = []
    for tok in raw:
        if tok in {"pref", "internet"}:
            continue
        if tok.startswith("x-"):
            tok = tok[2:]
        if tok:
            out.append(tok)
    return out


def source_priority(source: str | None) -> int:
    return SOURCE_PRIORITY.get((source or "").lower(), 0)


def rank_is_better(candidate: Rank, existing: Rank) -> bool:
    """Newer timestamp wins; a timestamp beats none; ties → higher
    source priority wins; full tie → keep existing."""
    c_ts, c_pri = candidate
    e_ts, e_pri = existing
    if c_ts and e_ts:
        if c_ts != e_ts:
            return c_ts > e_ts
    elif c_ts:
        return True
    elif e_ts:
        return False
    return c_pri > e_pri


def should_replace_label(existing_label: str, existing_rank: Rank,
                         candidate_label: str, candidate_rank: Rank) -> bool:
    """Label survivorship: better rank wins; equal priority may fill an
    empty label; a specific label displaces 'other' unless strictly
    older."""
    if rank_is_better(candidate_rank, existing_rank):
        return True
    if (candidate_rank[1] == existing_rank[1]
            and candidate_label and not existing_label):
        return True
    if (existing_label == "other" and candidate_label
            and candidate_label != "other"
            and not rank_is_better(existing_rank, candidate_rank)):
        return True
    return False
