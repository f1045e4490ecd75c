"""Portable, engine-independent hashing primitives.

Everything is built on md5 hex digests so the exact same values are
computable in Spark SQL (``md5()``), DuckDB (``md5()``), and Python
(``hashlib.md5``) — which is what lets every dedup/canonicalization
operator have a bit-exact SQL oracle.

MinHash here uses the "lexicographic min of salted md5 hex" trick: for seed
s, the signature component is ``min over shingles of md5(s || '|' || sh)``
compared as a string. That is a valid min-wise permutation family and is
portable across engines (no 64-bit integer overflow semantics to match).
"""

from __future__ import annotations

import hashlib


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def mention_id(doc_id: str, start: int, end: int, label: str) -> str:
    """Stable annotation identity (SURVEY.md §7 'Annotation identity')."""
    return sha256_hex(f"{doc_id}|{start}|{end}|{label}")[:32]


def char_shingles(text: str, k: int = 5) -> list[str]:
    """Distinct k-char shingles of the lowercased text."""
    t = text.lower()
    if len(t) < k:
        return [t] if t else []
    return sorted({t[i : i + k] for i in range(len(t) - k + 1)})


def token_ngrams(tokens: list[str], n: int = 3) -> list[str]:
    """Distinct token n-grams joined with a space."""
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    return sorted({" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)})


def minhash_signature(shingles: list[str], num_hashes: int = 16) -> list[str]:
    """Lexicographic-min minhash; component 4s+j is the min over shingles of
    the j-th 8-hex chunk of md5(f"{s}|" + shingle). Four components per md5
    call (the chunks of one digest are independent enough for min-wise
    hashing and it quarters the dominant md5 cost)."""
    if not shingles:
        return [""] * num_hashes
    out = []
    for seed in range((num_hashes + 3) // 4):
        digests = [md5_hex(f"{seed}|{sh}") for sh in shingles]
        for j in range(4):
            if len(out) < num_hashes:
                out.append(min(d[j * 8 : (j + 1) * 8] for d in digests))
    return out


def lsh_band_keys(signature: list[str], band_size: int = 4) -> list[str]:
    """Concatenate signature rows into band keys; equal band key => candidate."""
    return [
        "|".join(signature[i : i + band_size])
        for i in range(0, len(signature), band_size)
    ]


def hex16_to_int(h4: str) -> int:
    """First-4-hex-chars -> 16-bit int, engine-portable (per-char strpos math)."""
    digits = "0123456789abcdef"
    v = 0
    for c in h4:
        v = v * 16 + digits.index(c)
    return v


def simhash16(tokens: list[str]) -> int:
    """16-bit SimHash over token md5s; deterministic and SQL-replicable."""
    acc = [0] * 16
    for tok in tokens:
        h = hex16_to_int(md5_hex(tok)[:4])
        for b in range(16):
            acc[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(16):
        if acc[b] > 0:
            v |= 1 << b
    return v


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
