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


try:  # X4 (reference: src/services/extraction_service.py:50-57) — RTL display
    from bidi.algorithm import get_display as _bidi_get_display
except ImportError:  # python-bidi not installed in this environment
    _bidi_get_display = None


def fix_bidi_text(text: str) -> str:
    """X4: reorder RTL (Hebrew/Arabic) text for display via python-bidi.

    Gated behind an import-try per the environment constraints: when the
    library is absent this is the identity, and callers that need true
    visual reordering must install ``python-bidi``. Logical-order text (what
    every other kernel operates on) is unaffected either way.
    """
    if not text:
        return text or ""
    if _bidi_get_display is None:
        return text
    return _bidi_get_display(text)
