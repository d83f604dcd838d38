"""Quality-problem detectors (14 patterns) for extracted markdown pages.

Behavioral parity target: /root/reference/src/services/validation/problem_detector.py
(thresholds at :33,:78,:103,:130,:146,:178,:207,:224,:236,:292,:317,:339-348,:376,:394).
Each detector is a pure ``str -> bool``; ``detect_problems`` fuses the enabled
set into one call so the Spark side can run it as a single vectorized UDF.
"""
from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache
from typing import List, Optional, Tuple

from ..config import DEFAULT_ENABLED_PROBLEMS
from .numbers import extract_numbers, has_extractable_number

_EMPTY_TABLE_RE = re.compile(r"(\|\s*\|\s*\|.*\n){5,}")
_REPEAT_CHAR_RE = re.compile(r"(.)\1{9,}")
_REPEAT_CHAR_ALLOWED = {" ", "-", "_", "=", "*", "\n"}
_COMMON_CHARS = set(" \n\t.,;:!?-()[]{}\"'/\\|")
# C-speed character counting for the two per-char detectors. CPython's re
# classifies \w with the same predicate str.isalnum uses (Py_UNICODE_ISALNUM)
# plus '_', so [^\W_] matches EXACTLY the isalnum characters — equivalence is
# pinned by a hypothesis property test (test_kernels_detectors).
_ALNUM_RUN_RE = re.compile(r"[^\W_]+")
_COMMON_RUN_RE = re.compile("[" + re.escape("".join(sorted(_COMMON_CHARS))) + "]+")


@lru_cache(maxsize=8)
def _table_lines(content: str) -> tuple:
    """Stripped pipe-prefixed lines — shared by four detectors that each
    scanned the page independently; cached per page object (see
    _alnum_count on why the repeat lookup is ~free)."""
    return tuple(
        s for ln in content.split("\n") if (s := ln.strip()).startswith("|")
    )


@lru_cache(maxsize=8)
def _alnum_count(content: str) -> int:
    # two detectors (density, garbled) count the same page back-to-back;
    # CPython caches str hashes, so the repeat lookup is ~free
    return sum(map(len, _ALNUM_RUN_RE.findall(content)))
_TABLE_NUM_REPEAT_RE = re.compile(r"\|\s*(\d+(?:[.,]\d+)?)\s*\|(?:\s*\1\s*\|){2,}")
_TEXT_NUM_REPEAT_RE = re.compile(r"\b(\d+(?:[.,]\d+)?)\s+(?:\1\s+){2,}")
_UNKNOWN_CHARS = ["□", "�", "☐", "▯", "▢", "▣"]
_STANDALONE_Q_RE = re.compile(r"\s\?\s")
_MD_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^\)]+)\)")

FINANCIAL_KEYWORDS = [
    "revenue", "expense", "balance", "asset", "liability", "equity",
    "income", "profit", "loss", "debit", "credit", "account",
    "total", "subtotal", "amount", "date", "transaction", "payment",
    "statement", "bank", "financial", "report", "summary",
    "הכנסות", "הוצאות", "יתרה", "חשבון", "סכום",
    'סה"כ', "זכות", "חובה", "תאריך", "עסקה",
    "תשלום", "דוח", "כספי", "מאזן", "רווח", "הפסד",
]


def detect_empty_tables(content: str) -> bool:
    """>=5 consecutive mostly-empty table lines ``| | |``."""
    return bool(content) and _EMPTY_TABLE_RE.search(content) is not None


def detect_low_content_density(content: str) -> bool:
    """Fewer than 100 alphanumeric characters (empty content counts)."""
    if not content:
        return True
    return _alnum_count(content) < 100


def detect_missing_numbers(content: str) -> bool:
    """Roughly >=5 table rows (pipes/4) but zero extractable numbers."""
    if not content:
        return False
    approx_rows = content.count("|") / 4
    return approx_rows >= 5 and not has_extractable_number(content)


def detect_inconsistent_columns(content: str) -> bool:
    """More than 2 distinct per-row column counts among pipe-rows."""
    if not content:
        return False
    table_lines = _table_lines(content)
    if len(table_lines) < 3:
        return False
    return len({ln.count("|") - 1 for ln in table_lines}) > 2


def detect_repeated_characters(content: str) -> bool:
    """Same char repeated 10+ times, excluding intentional fillers."""
    if not content:
        return False
    return any(m not in _REPEAT_CHAR_ALLOWED for m in _REPEAT_CHAR_RE.findall(content))


def detect_garbled_text(content: str) -> bool:
    """Special-char to alphanumeric ratio above 0.2."""
    if not content:
        return False
    alnum = _alnum_count(content)
    if alnum == 0:
        return True
    # every char is alnum XOR common XOR special (common chars are all
    # non-alnum), so special falls out of two C-speed counts
    common = sum(map(len, _COMMON_RUN_RE.findall(content)))
    special = len(content) - alnum - common
    return special / alnum > 0.2


def detect_header_only_tables(content: str) -> bool:
    """Table with a separator row but <=1 data row after it."""
    if not content:
        return False
    lines = _table_lines(content)
    if len(lines) < 2:
        return False
    sep_indices = [i for i, ln in enumerate(lines) if "---" in ln]
    if not sep_indices:
        return False
    return len(lines) - sep_indices[0] - 1 <= 1


def detect_very_short_pages(content: str) -> bool:
    """Stripped length under 200 characters (empty counts)."""
    if not content:
        return True
    return len(content.strip()) < 200


def detect_missing_keywords(content: str) -> bool:
    """Substantial page (>=500 chars) containing no financial keyword."""
    if not content or len(content) < 500:
        return False
    lower = content.lower()
    return not any(kw in lower for kw in FINANCIAL_KEYWORDS)


def detect_malformed_structure(content: str) -> bool:
    """A table separator row where >30% of parts aren't dashes/spaces."""
    if not content:
        return False
    table_lines = _table_lines(content)
    if len(table_lines) < 2:
        return False
    for sep in (ln for ln in table_lines if "-" in ln):
        flags = [set(p.strip()) <= {"-", " "} for p in sep.split("|") if p.strip()]
        if flags and sum(flags) / len(flags) < 0.7:
            return True
    return False


def detect_duplicate_content(content: str) -> bool:
    """Same >50-char paragraph appearing 3+ times."""
    if not content:
        return False
    paragraphs = [p.strip() for p in content.split("\n\n") if p.strip()]
    if len(paragraphs) < 3:
        return False
    return any(
        count >= 3 and len(para) > 50 for para, count in Counter(paragraphs).items()
    )


def detect_repetitive_numbers(content: str) -> bool:
    """Same number 3+ times adjacent, in table cells or space-separated text."""
    if not content:
        return False
    if _TABLE_NUM_REPEAT_RE.search(content):
        return True
    return _TEXT_NUM_REPEAT_RE.search(content) is not None


def detect_unknown_characters(content: str) -> bool:
    """Ratio of replacement glyphs + standalone '?' above 5%."""
    if not content:
        return False
    unknown = sum(content.count(ch) for ch in _UNKNOWN_CHARS)
    unknown += len(_STANDALONE_Q_RE.findall(content))
    return unknown / len(content) > 0.05


def detect_markdown_images(content: str) -> bool:
    """Any markdown image reference ``![alt](path)``."""
    return bool(content) and _MD_IMAGE_RE.search(content) is not None


DETECTOR_REGISTRY = {
    "empty_tables": detect_empty_tables,
    "low_content_density": detect_low_content_density,
    "missing_numbers": detect_missing_numbers,
    "inconsistent_columns": detect_inconsistent_columns,
    "repeated_characters": detect_repeated_characters,
    "garbled_text": detect_garbled_text,
    "header_only_tables": detect_header_only_tables,
    "very_short_pages": detect_very_short_pages,
    "missing_keywords": detect_missing_keywords,
    "malformed_structure": detect_malformed_structure,
    "duplicate_content": detect_duplicate_content,
    "unknown_characters": detect_unknown_characters,
    "repetitive_numbers": detect_repetitive_numbers,
    "markdown_images": detect_markdown_images,
}


def detect_problems(
    content: str, enabled: Optional[List[str]] = None
) -> List[str]:
    """Return the names of all enabled problems detected in *content*.

    Empty content short-circuits to ``['empty_content']`` (reference:
    problem_detector.py:465-466).
    """
    if not content:
        return ["empty_content"]
    if enabled is None:
        enabled = DEFAULT_ENABLED_PROBLEMS
    return [name for name in enabled
            if name in DETECTOR_REGISTRY and DETECTOR_REGISTRY[name](content)]


def has_any_problem(
    content: str, enabled: Optional[List[str]] = None
) -> Tuple[bool, List[str]]:
    detected = detect_problems(content, enabled)
    return bool(detected), detected
