"""String & set similarity: difflib ratio, shingles, MinHash, SimHash.

- seq_ratio ≡ the reference's merge-critical similarity
  (normalization.py:392-393, threshold 0.88 in config.yaml:68-70) —
  difflib.SequenceMatcher semantics, NOT Levenshtein; parity matters.
- shingles / minhash_signature / simhash64: the scale path for near-dup
  detection (SURVEY.md north star: LLM-data dedup at 100 TB). Pure
  functions here; the distributed operators live in
  operators/dedup.py as DataFrame programs.
"""

from __future__ import annotations

import hashlib
import struct
from difflib import SequenceMatcher
from functools import lru_cache


def seq_ratio(a: str | None, b: str | None) -> float:
    """difflib ratio on lowercased strings → [0, 1].

    Short inputs (names — the ER gate's hot case) are memoized (r12):
    blocked contact data re-scores the same (first, first) pairs
    thousands of times across a block, and a dict hit is ~100×
    cheaper than SequenceMatcher. Pure function, so the cache is
    value-transparent; long strings (document/comment similarity —
    mostly unique) bypass it so the cache neither churns nor holds
    big keys. Bounded, per-worker, within-process only — nothing
    persists across runs."""
    al, bl = (a or "").lower(), (b or "").lower()
    if len(al) + len(bl) <= 64:
        return _seq_ratio_cached(al, bl)
    return SequenceMatcher(None, al, bl).ratio()


@lru_cache(maxsize=1 << 16)
def _seq_ratio_cached(al: str, bl: str) -> float:
    return SequenceMatcher(None, al, bl).ratio()


def char_shingles(text: str, k: int = 5) -> set[str]:
    """Character k-grams of a normalized text."""
    s = " ".join((text or "").lower().split())
    if len(s) < k:
        return {s} if s else set()
    return {s[i:i + k] for i in range(len(s) - k + 1)}


def token_shingles(text: str, n: int = 3) -> set[str]:
    """Word n-grams."""
    toks = (text or "").lower().split()
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _hash64(data: str, seed: int = 0) -> int:
    """Stable 64-bit hash (md5-based → deterministic across workers,
    unlike Python's salted hash())."""
    h = hashlib.md5(f"{seed}:{data}".encode()).digest()
    return struct.unpack("<Q", h[:8])[0]


def minhash_signature(shingles: set[str], num_hashes: int = 64) -> list[int]:
    """MinHash signature: per hash seed, min over shingle hashes.
    E[Jaccard] = fraction of agreeing positions."""
    if not shingles:
        return [0] * num_hashes
    return [min(_hash64(s, seed) for s in shingles) for seed in range(num_hashes)]


def minhash_bands(signature: list[int], bands: int = 16) -> list[int]:
    """LSH banding: hash each band of the signature to a bucket id.
    Pairs sharing ≥1 band bucket become candidates."""
    rows = max(1, len(signature) // bands)
    out = []
    for b in range(bands):
        chunk = signature[b * rows:(b + 1) * rows]
        out.append(_hash64(",".join(map(str, chunk)), seed=10_000 + b))
    return out


def simhash64(tokens: list[str] | set[str]) -> int:
    """64-bit SimHash over tokens; near-dups differ in few bits."""
    if not tokens:
        return 0
    counts = [0] * 64
    for tok in tokens:
        h = _hash64(tok)
        for bit in range(64):
            counts[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if counts[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)
