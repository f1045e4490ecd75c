"""Text-analysis scalar functions for the training-data pipeline:
language-ID heuristic, quality scoring, token counting, fingerprinting.

All are specified so the same computation is expressible in Spark SQL and
DuckDB SQL (integer/string ops only, division done once at the end) —
the Python versions back the pandas-UDF pipeline path and unit tests.
"""

from __future__ import annotations

import re

from .hashing import md5_hex

STOPWORDS = ("the", "a", "and", "at", "of", "in", "to", "it")

# marker-word table for the n-gram/keyword language heuristic. The synthetic
# corpus shares one vocabulary across langs, so the heuristic is specified on
# structural signals (doc length mod buckets) — deterministic, and honest
# about being a placeholder for a real char-n-gram model at 100 TB scale.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "fr": ("le", "et", "la"),
    "es": ("el", "y", "la"),
    "zh": (),
}


def simple_tokens(text: str) -> list[str]:
    return re.findall(r"\S+", text)


def token_count(text: str) -> int:
    return len(simple_tokens(text))


def stopword_ratio(tokens: list[str]) -> float:
    if not tokens:
        return 0.0
    return sum(1 for t in tokens if t.lower() in STOPWORDS) / len(tokens)


def distinct_token_ratio(tokens: list[str]) -> float:
    if not tokens:
        return 0.0
    return len(set(tokens)) / len(tokens)


def quality_score(text: str) -> float:
    """Composite in [0,1]: rewards mid-length docs, lexical diversity and a
    sane stopword rate — the standard pretraining-corpus quality recipe
    (Gopher/C4-style rules) reduced to deterministic integer-friendly parts."""
    toks = simple_tokens(text)
    n = len(toks)
    if n == 0:
        return 0.0
    length_part = min(n, 200) / 200.0
    diversity_part = distinct_token_ratio(toks)
    stop = stopword_ratio(toks)
    stop_part = 1.0 if 0.01 <= stop <= 0.6 else 0.5
    return round((length_part + diversity_part + stop_part) / 3.0, 6)


def lang_id(text: str) -> str:
    """Keyword-marker language guess with 'en' fallback."""
    toks = [t.lower() for t in simple_tokens(text)]
    tokset = set(toks)
    best, best_hits = "en", 0
    for lang, markers in LANG_MARKERS.items():
        hits = sum(1 for m in markers if m in tokset)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def fingerprint(text: str) -> str:
    """Content fingerprint: md5 of whitespace-normalized lowercase text."""
    return md5_hex(" ".join(text.lower().split()))
