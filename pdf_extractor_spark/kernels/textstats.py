"""Training-data text-analysis kernels: language ID, quality scoring, token
counting, document fingerprinting, shingling.

These extend the reference's detector suite (problem_detector.py) toward the
operations a large-scale training-data pipeline needs; heuristics are
public-knowledge (stopword/script ratios, Gottron-style density scoring,
Rabin-Karp rolling hash, w-shingling). All functions are deterministic and
also expressed as SQL for DuckDB-oracle parity where feasible.
"""
from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Tuple

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols.
_TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", re.UNICODE)

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "dans", "que", "une"],
    "de": ["der", "die", "und", "das", "von", "ist", "den", "mit", "für", "auf"],
}

_HEBREW_RE = re.compile(r"[֐-׿]")
_ARABIC_RE = re.compile(r"[؀-ۿ]")
_CJK_RE = re.compile(r"[一-鿿]")
_CYRILLIC_RE = re.compile(r"[Ѐ-ӿ]")


def token_count(text: str) -> int:
    """BPE-ish token count: alpha runs, digit runs, single symbols."""
    if not text:
        return 0
    return len(_TOKEN_RE.findall(text))


def whitespace_token_count(text: str) -> int:
    return len(text.split()) if text else 0


def detect_language(text: str) -> str:
    """n-gram/stopword heuristic language ID. Script check first (he/ar/zh/ru),
    then the Latin language with the highest stopword hit-count; 'und' when
    nothing matches."""
    if not text:
        return "und"
    sample = text[:2000]
    n = len(sample)
    if n and len(_HEBREW_RE.findall(sample)) / n > 0.2:
        return "he"
    if n and len(_ARABIC_RE.findall(sample)) / n > 0.2:
        return "ar"
    if n and len(_CJK_RE.findall(sample)) / n > 0.1:
        return "zh"
    if n and len(_CYRILLIC_RE.findall(sample)) / n > 0.2:
        return "ru"
    words = set(w.lower() for w in _WORD_RE.findall(sample))
    best_lang, best_hits = "und", 0
    for lang in sorted(STOPWORDS):
        hits = sum(1 for sw in STOPWORDS[lang] if sw in words)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= 2 else "und"


def quality_score(text: str) -> float:
    """Composite [0,1] quality score from length, alpha ratio, mean word
    length sanity, and stopword presence — rounded to 6 decimals so the Spark
    and DuckDB oracle computations agree bit-for-bit."""
    if not text:
        return 0.0
    n = len(text)
    words = text.split()
    n_words = len(words)
    if n_words == 0:
        return 0.0
    alpha_ratio = sum(c.isalpha() for c in text) / n
    mean_wlen = sum(len(w) for w in words) / n_words
    wlen_ok = 1.0 if 3.0 <= mean_wlen <= 12.0 else 0.0
    length_ok = min(1.0, n / 200.0)
    lower_words = set(w.lower() for w in words)
    stop_hits = sum(1 for sw in STOPWORDS["en"] if sw in lower_words)
    stop_ratio = min(1.0, stop_hits / 5.0)
    return round(0.3 * alpha_ratio + 0.2 * wlen_ok + 0.3 * length_ok
                 + 0.2 * stop_ratio, 6)


_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fingerprint64(text: str) -> int:
    """FNV-1a 64-bit fingerprint of the text (deterministic, signed int64)."""
    h = _FNV_OFFSET
    for byte in text.encode("utf-8"):
        h = ((h ^ byte) * _FNV_PRIME) & _MASK64
    return h - (1 << 64) if h >= (1 << 63) else h


def md5_fingerprint(text: str) -> str:
    """Hex md5 of the text — matches Spark ``md5()`` and DuckDB ``md5()`` for
    oracle-checkable dedup keys."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def shingles(text: str, k: int = 3) -> List[str]:
    """Sorted distinct word k-shingles (space-joined)."""
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return sorted({" ".join(words[i:i + k]) for i in range(len(words) - k + 1)})


def simhash64(text: str) -> int:
    """64-bit SimHash over word features using md5-derived feature hashes
    (deterministic across platforms). Signed int64.

    Vectorized bit votes (round 4): the per-word md5 stays a Python loop
    (hashlib has no batch API), but the 64 per-bit ±1 votes ride one numpy
    broadcast instead of 64 Python ops per word — identical values, ~10x
    on long documents (the simhash_udf hot path)."""
    words = text.split()
    if not words:
        return 0
    import numpy as np

    hs = np.array(
        [
            int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16)
            for w in words
        ],
        dtype=np.uint64,
    )
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    counts = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = int(
        (
            (counts > 0).astype(np.uint64)
            << np.arange(64, dtype=np.uint64)
        ).sum(dtype=np.uint64)
    )
    return out - (1 << 64) if out >= (1 << 63) else out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")


def minhash_signature(text: str, n_hashes: int = 16, k: int = 3) -> List[str]:
    """MinHash signature: per seed i, min md5 hex of ``f"{i}:{shingle}"``.
    String-min keeps it reproducible in Spark SQL *and* DuckDB
    (``min(md5(i || ':' || shingle))``)."""
    sh = shingles(text, k)
    if not sh:
        return [""] * n_hashes
    return [
        min(hashlib.md5(f"{i}:{s}".encode("utf-8")).hexdigest() for s in sh)
        for i in range(n_hashes)
    ]


def jaccard_words(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0
