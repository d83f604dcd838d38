"""Similarity kernels: number-frequency cosine, Levenshtein, Jaccard pre-check.

Behavioral parity target:
/root/reference/src/services/validation/similarity_calculator.py:32-245.
The Levenshtein implementation is original (classic two-row DP) since the
reference uses the C ``Levenshtein`` package, unavailable here; identical
distance semantics.
"""
from __future__ import annotations

import math
from collections import Counter
from typing import Dict

from ..config import VALIDATION_SIMILARITY_METHOD
from .normalize import normalize_for_comparison
from .numbers import extract_numbers


def levenshtein_distance(a: str, b: str) -> int:
    """Classic edit distance (insert/delete/substitute, unit costs)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        curr = [i]
        for j, cb in enumerate(b, start=1):
            curr.append(min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = curr
    return prev[-1]


def cosine_similarity_freq(freq1: Dict[str, int], freq2: Dict[str, int]) -> float:
    """Cosine over two frequency maps; both-empty -> 1.0, one-empty -> 0.0."""
    if not freq1 and not freq2:
        return 1.0
    if not freq1 or not freq2:
        return 0.0
    keys = set(freq1) | set(freq2)
    dot = sum(freq1.get(k, 0) * freq2.get(k, 0) for k in keys)
    mag1 = math.sqrt(sum(v * v for v in freq1.values()))
    mag2 = math.sqrt(sum(v * v for v in freq2.values()))
    if mag1 == 0 or mag2 == 0:
        return 0.0
    return max(0.0, min(1.0, dot / (mag1 * mag2)))


def similarity_number_frequency(content1: str, content2: str) -> float:
    """Cosine similarity of extracted-number frequency distributions."""
    freq1 = dict(Counter(extract_numbers(content1)))
    freq2 = dict(Counter(extract_numbers(content2)))
    return cosine_similarity_freq(freq1, freq2)


def similarity_levenshtein(content1: str, content2: str) -> float:
    """1 - dist/max_len over alphanumeric-normalized strings, with the
    reference's empty-edge handling."""
    if not content1 and not content2:
        return 1.0
    if not content1 or not content2:
        return 0.0
    n1 = normalize_for_comparison(content1)
    n2 = normalize_for_comparison(content2)
    if not n1 and not n2:
        return 1.0
    if not n1 or not n2:
        return 0.0
    dist = levenshtein_distance(n1, n2)
    return max(0.0, min(1.0, 1.0 - dist / max(len(n1), len(n2))))


def quick_similarity(content1: str, content2: str) -> float:
    """Jaccard word-set similarity, gated on a <=5% length difference."""
    len1, len2 = len(content1), len(content2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if abs(len1 - len2) / max(len1, len2) > 0.05:
        return 0.0
    w1, w2 = set(content1.split()), set(content2.split())
    if not w1 or not w2:
        return 0.0
    union = len(w1 | w2)
    return len(w1 & w2) / union if union else 0.0


def calculate_similarity(
    content1: str, content2: str, method: str = VALIDATION_SIMILARITY_METHOD
) -> float:
    """Dispatcher: quick Jaccard early-exit above 0.95, else the configured
    full method (number_frequency default, levenshtein alternative)."""
    quick = quick_similarity(content1, content2)
    if quick > 0.95:
        return quick
    if method == "levenshtein":
        return similarity_levenshtein(content1, content2)
    return similarity_number_frequency(content1, content2)
