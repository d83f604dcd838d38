"""Text normalization kernels.

Semantics match the reference's ContentNormalizer
(/root/reference/src/services/validation/content_normalizer.py:14-28) and
safe-filename logic (/root/reference/src/services/workflows/default_handler.py:176-182).
Implementation is original (regex single-pass instead of per-char loop).
"""
from __future__ import annotations

import re

# Unicode-aware: \w minus underscore == alphanumerics incl. Hebrew/Arabic/CJK.
_NON_ALNUM_RE = re.compile(r"[\W_]+", re.UNICODE)


def normalize_for_comparison(text: str) -> str:
    """Keep only Unicode alphanumerics, lowercased.

    Equivalent to the reference's per-character ``isalnum`` filter + lower.
    """
    if not text:
        return ""
    return _NON_ALNUM_RE.sub("", text).lower()


_UNSAFE_FILENAME_RE = re.compile(r"[^0-9A-Za-z _\-]")


def safe_filename(title: str, max_len: int = 50) -> str:
    """Sanitize a section title into a filename: keep alnum/space/dash/underscore,
    truncate, spaces -> underscores."""
    kept = _UNSAFE_FILENAME_RE.sub("", title or "")
    return kept[:max_len].strip().replace(" ", "_")
