"""Name parsing: particles, prefixes, suffixes, nicknames, email guesses.

Parity targets (reference /root/reference/src/contacts_etl/):
- split_multi_last     ≡ parse_name_multi_last (normalization.py:404-438)
- parse_full_name      ≡ strip_suffixes_and_parse_name (normalization.py:441-540)
- nickname_root/equivalent ≡ normalization.py:697-704
- guess_from_email_local ≡ guess_name_from_email_local (normalization.py:680-684)
- initial_from_email   ≡ reconcile_name_from_email_and_last (normalization.py:687-694)

These are the branchy token-scan functions SURVEY.md §2.3 flags as
pandas-UDF territory: the cores here are pure and stateless, so they
vectorize cleanly over Arrow batches.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from contacts_etl_phase21_spark.functions.data import (
    GENERATIONAL_SUFFIXES,
    HONORIFIC_PREFIXES,
    NICKNAME_ROOTS,
    PROFESSIONAL_SUFFIXES,
    SURNAME_PARTICLES,
)
from contacts_etl_phase21_spark.functions.text import fold_text

_ALNUM_ONLY = re.compile(r"[^a-z0-9]")
_PAREN = re.compile(r"\(([^)]+)\)")
_NAME_PART_SPLIT = re.compile(r"[,–—-]+")
_PROF_GROUP_SPLIT = re.compile(r"[\\/|&+]+")
_MAIDEN_SPLIT = re.compile(r"[,/&;]+")
_LOCALPART_SPLIT = re.compile(r"[._-]+")

_VARIANT_TO_ROOT: dict[str, str] = {}
for _root, _variants in NICKNAME_ROOTS.items():
    _VARIANT_TO_ROOT[fold_text(_root)] = _root
    for _v in _variants:
        _VARIANT_TO_ROOT[fold_text(_v)] = _root


def squash_token(token: str | None) -> str:
    """Lowercase and drop non-alphanumerics — suffix/prefix comparison key."""
    return _ALNUM_ONLY.sub("", (token or "").lower())


def nickname_root(name: str | None) -> str:
    key = fold_text(name)
    return _VARIANT_TO_ROOT.get(key, key)


def nickname_equivalent(a: str | None, b: str | None) -> bool:
    if not a or not b:
        return False
    return nickname_root(a) == nickname_root(b)


def _is_initial(token: str) -> bool:
    t = (token or "").strip()
    return (len(t) == 2 and t[1] == "." and t[0].isalpha()) or (
        len(t) == 1 and t.isalpha() and t.isupper())


def split_multi_last(name: str | None) -> tuple[str, str, str]:
    """(first, middle, last) with particle-aware multi-token surnames:
    'Ana de la Cruz' → ('Ana', '', 'de la Cruz')."""
    if not name:
        return "", "", ""
    tokens = name.split()
    if len(tokens) == 1:
        return tokens[0], "", ""
    surname = [tokens[-1]]
    i = len(tokens) - 2
    while i >= 1:
        tok = tokens[i]
        key = tok.lower().strip(".")
        is_particle = key in SURNAME_PARTICLES and not _is_initial(tok)
        is_apostrophe_prefix = (key in {"o", "d", "l"}
                                and i + 1 < len(tokens) and "'" in tokens[i + 1])
        lowercase_run = bool(tok) and tok[0].islower() and tokens[i + 1][0].isupper()
        if is_particle or is_apostrophe_prefix or lowercase_run:
            surname.insert(0, tok)
            i -= 1
            continue
        break
    middle = " ".join(tokens[1:i + 1]) if i >= 1 else ""
    return tokens[0], middle, " ".join(surname)


@dataclass
class ParsedName:
    first: str = ""
    middle: str = ""
    last: str = ""
    generational: str = ""
    professional: list[str] = field(default_factory=list)
    maiden: str = ""
    prefix: str = ""
    clean_full: str = ""


def _professional_parts(token: str, prof: frozenset[str] | set[str]) -> list[str]:
    """A token counts as professional-suffix material if it (or every
    piece of a '/','|','&','+' compound) squashes into the suffix set."""
    t = (token or "").strip()
    if not t:
        return []
    key = squash_token(t)
    if key in prof or key.endswith("spc6"):
        return [t]
    pieces = [p.strip() for p in _PROF_GROUP_SPLIT.split(t) if p.strip()]
    if len(pieces) > 1:
        keys = [squash_token(p) for p in pieces]
        if all(k in prof or k.endswith("spc6") for k in keys):
            return pieces
    return []


def parse_full_name(
    full_name: str | None,
    gen: frozenset[str] | set[str] = GENERATIONAL_SUFFIXES,
    prof: frozenset[str] | set[str] = PROFESSIONAL_SUFFIXES,
    prefixes: frozenset[str] | set[str] = HONORIFIC_PREFIXES,
) -> ParsedName:
    """Full name decomposition: parenthetical maiden names, honorific
    prefixes, generational + professional suffixes (incl. compounds like
    'CPA/MBA'), then particle-aware first/middle/last."""
    raw = str(full_name or "").strip()
    if not raw:
        return ParsedName()
    p = ParsedName()

    paren_text = ""
    m = _PAREN.search(raw)
    if m:
        paren_text = m.group(1).strip()
        raw = (raw[:m.start()] + raw[m.end():]).strip()

    kept_segments: list[str] = []
    for segment in (s.strip() for s in _NAME_PART_SPLIT.split(raw) if s.strip()):
        tokens = segment.split()
        # honorific prefixes at the front
        eaten: list[str] = []
        while tokens and squash_token(tokens[0]) in prefixes:
            eaten.append(tokens.pop(0))
        if eaten and not p.prefix:
            p.prefix = " ".join(eaten)
        if not tokens:
            continue
        # professional suffixes at the tail (possibly several, each maybe
        # a compound group); preserve original left-to-right order
        tail_groups: list[list[str]] = []
        while tokens:
            parts = _professional_parts(tokens[-1], prof)
            if not parts:
                break
            tokens.pop()
            tail_groups.append(parts)
        for group in reversed(tail_groups):
            p.professional.extend(group)
        # generational suffix at the (new) tail
        while tokens and squash_token(tokens[-1]) in gen:
            p.generational = tokens.pop()
        if not tokens:
            continue
        if len(tokens) == 1:
            only = tokens[0]
            parts = _professional_parts(only, prof)
            if parts:
                p.professional.extend(parts)
                continue
            if squash_token(only) in gen:
                p.generational = only
                continue
        kept_segments.append(" ".join(tokens))

    if paren_text:
        maiden_tokens: list[str] = []
        for token in (t.strip() for t in _MAIDEN_SPLIT.split(paren_text) if t.strip()):
            parts = _professional_parts(token, prof)
            if parts:
                p.professional.extend(parts)
            else:
                maiden_tokens.append(token)
        p.maiden = " ".join(maiden_tokens)

    p.first, p.middle, p.last = split_multi_last(" ".join(kept_segments).strip())
    p.clean_full = " ".join(
        x for x in (p.prefix, p.first, p.middle, p.last, p.generational) if x)
    return p


def guess_from_email_local(local: str | None) -> tuple[str, str]:
    """jane.doe → ('Jane', 'Doe'); single token → (token.title(), '')."""
    pieces = [x for x in _LOCALPART_SPLIT.split(local or "") if x]
    first = pieces[0].title() if pieces else ""
    last = pieces[1].title() if len(pieces) > 1 else ""
    return first, last


def initial_from_email(local: str | None, last: str | None) -> str:
    """jdoe + Doe → 'J' (1-2 char prefix before the surname)."""
    lo, la = (local or "").lower(), (last or "").lower()
    if la and lo.endswith(la) and len(lo) > len(la):
        head = lo[:-len(la)]
        if 1 <= len(head) <= 2:
            return head[0].upper()
    return ""
