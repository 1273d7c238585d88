"""Text-analysis kernels for the large-scale training-data operators:
language ID, quality scoring, token counting, document fingerprinting.

All pure, deterministic, vectorization-friendly; Ray wrappers live in
stages/dataops.py. Integer-valued scores (permille / centi units) are used
where a DuckDB oracle must reproduce the value exactly without float
round-trip hazards.
"""

from __future__ import annotations

import hashlib
import re

STOPWORDS_EN = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

# tiny deterministic stopword profiles for n-gram-free language ID
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in", "a", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}

_BPE_ISH = re.compile(r"\w+|[^\w\s]")


def token_count(text: str) -> int:
    """Whitespace token count."""
    return len(text.split())


def bpe_ish_token_count(text: str) -> int:
    """Regex word/punct tokenization (a BPE-like proxy without a model)."""
    return len(_BPE_ISH.findall(text))


def quality_stats(text: str) -> dict:
    """Length / punctuation / stopword statistics as exact integers:
    - ``n_words``: whitespace tokens
    - ``stopword_permille``: 1000 * stopword_count // n_words
    - ``mean_word_len_centi``: 100 * total_word_chars // n_words
    - ``punct_permille``: 1000 * punct_chars // total_chars
    """
    words = text.split()
    n = len(words)
    if n == 0:
        return {
            "n_words": 0,
            "stopword_permille": 0,
            "mean_word_len_centi": 0,
            "punct_permille": 0,
        }
    lower = [w.lower() for w in words]
    stop = sum(1 for w in lower if w in STOPWORDS_EN)
    total_chars = sum(len(w) for w in words)
    punct = sum(1 for ch in text if not ch.isalnum() and not ch.isspace())
    n_chars = len(text)
    return {
        "n_words": n,
        "stopword_permille": (1000 * stop) // n,
        "mean_word_len_centi": (100 * total_chars) // n,
        "punct_permille": (1000 * punct) // n_chars if n_chars else 0,
    }


def detect_language(text: str) -> str:
    """Stopword-profile language ID; CJK scripts detected by codepoint.
    Returns a language code or 'und'."""
    for ch in text[:200]:
        if "一" <= ch <= "鿿":
            return "zh"
        if "぀" <= ch <= "ヿ":
            return "ja"
    words = set(w.lower() for w in text.split()[:200])
    best_lang, best_hits = "und", 0
    for lang in sorted(_LANG_PROFILES):
        hits = len(words & _LANG_PROFILES[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= 2 else "und"


def md5_fingerprint(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


_FP_MASK = (1 << 63) - 1  # int64-safe on both Arrow and DuckDB BIGINT


def _md5_number_lower(s: str) -> int:
    """Little-endian uint64 of the LAST 8 md5 bytes — bit-identical to
    DuckDB's ``md5_number_lower(s)`` so SQL oracles can reproduce every
    md5-derived kernel value exactly."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def repetition_stats(text: str) -> dict:
    """Gopher-style repetition signals as exact integers (Rae et al.
    2021 §A1.1 use duplicate-n-gram and top-n-gram character fractions
    as boilerplate filters; this is the token-count analogue):

    - ``dup_{2,3}gram_permille``: 1000 * (total - distinct) // total
      over the doc's n-gram multiset — how much of the doc is verbatim
      n-gram repetition.
    - ``top_{2,3}gram_permille``: 1000 * max_count // total — how much
      a single n-gram dominates.

    Zero for docs shorter than n tokens. Integer permille so a DuckDB
    oracle reproduces every value exactly.
    """
    from collections import Counter

    words = text.split()
    out = {}
    for n in (2, 3):
        grams = [
            " ".join(words[i : i + n])
            for i in range(len(words) - n + 1)
        ]
        total = len(grams)
        if total == 0:
            out[f"dup_{n}gram_permille"] = 0
            out[f"top_{n}gram_permille"] = 0
            continue
        counts = Counter(grams)
        out[f"dup_{n}gram_permille"] = (
            1000 * (total - len(counts)) // total
        )
        out[f"top_{n}gram_permille"] = (
            1000 * max(counts.values()) // total
        )
    return out


# PII scrub patterns: lookaround-free and anchored on literal character
# classes so Python re and DuckDB's RE2 (regexp_replace ... 'g') match
# the same spans — both engines use leftmost-first greedy semantics on
# these shapes. URLs are scrubbed BEFORE emails so a userinfo '@' inside
# a URL is not double-counted.
_URL_RE = re.compile(r"https?://[^\s]+")
_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+")


def redact_pii(text: str) -> tuple:
    """Replace URLs with ``<URL>`` and email addresses with ``<EMAIL>``;
    returns ``(scrubbed_text, n_redactions)``. Deterministic and
    SQL-reproducible (see SQL_SCRUBBED_DOCS in queries.py)."""
    scrubbed, n_url = _URL_RE.subn("<URL>", text)
    scrubbed, n_email = _EMAIL_RE.subn("<EMAIL>", scrubbed)
    return scrubbed, n_url + n_email


def winnow_fingerprints(text: str, k: int = 4, w: int = 5) -> list:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every k-gram of words, then
    keep the MINIMUM hash of each sliding window of ``w`` consecutive
    k-gram hashes; the distinct minima are the fingerprint set. The
    guarantee: any shared run of ``w + k - 1`` words between two docs
    yields at least one shared fingerprint.

    Returns the sorted distinct fingerprint values. Degenerate inputs
    mirror :func:`rolling_fingerprint`: fewer than k words → one
    fingerprint of the whole word string ('' included for the empty
    doc); fewer than w k-grams → the single min over all of them.
    md5-based so a DuckDB oracle reproduces every value bit-for-bit."""
    words = text.split()
    if len(words) < k:
        return [_md5_number_lower(" ".join(words)) & _FP_MASK]
    hashes = [
        _md5_number_lower(" ".join(words[i : i + k])) & _FP_MASK
        for i in range(len(words) - k + 1)
    ]
    if len(hashes) <= w:
        return [min(hashes)]
    return sorted(
        {min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)}
    )


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Deterministic rolling-hash document fingerprint: min 63-bit
    md5-number over word-window shingles (a 1-perm MinHash; robust to
    local edits). md5-based so a SQL oracle (DuckDB ``md5_number_lower``)
    reproduces it bit-for-bit."""
    words = text.split()
    if len(words) <= window:
        return _md5_number_lower(" ".join(words)) & _FP_MASK
    return min(
        _md5_number_lower(" ".join(words[i : i + window])) & _FP_MASK
        for i in range(len(words) - window + 1)
    )
