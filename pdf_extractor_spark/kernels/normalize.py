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
except ImportError:  # python-bidi not installed: use the built-in mini-UBA
    _bidi_get_display = None


# --- Minimal Unicode Bidirectional Algorithm (UAX #9 subset) -----------------
# Implements the implicit-level path of the public UBA spec: P2-P3 paragraph
# direction, W1-W7 weak-type resolution, N1-N2 neutrals, I1-I2 implicit
# levels, L1 trailing whitespace, L2 run reversal, L4 mirroring. Explicit
# embedding/override/isolate codes (X rules) are not handled — table cells
# never contain them. Character classes come from unicodedata.bidirectional.

_MIRROR = {"(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{",
           "<": ">", ">": "<", "«": "»", "»": "«"}
_NEUTRAL = {"B", "S", "WS", "ON"}


def _bidi_display(text: str) -> str:
    import unicodedata

    types = [unicodedata.bidirectional(ch) or "ON" for ch in text]

    # P2/P3: paragraph direction from the first strong character
    base = 0
    for t in types:
        if t == "L":
            break
        if t in ("R", "AL"):
            base = 1
            break
    sos = "R" if base else "L"

    # W1: NSM takes the type of the previous character (sos at start)
    prev = sos
    for i, t in enumerate(types):
        if t == "NSM":
            types[i] = prev
        prev = types[i]
    # W2: EN -> AN when the last strong type is AL
    strong = sos
    for i, t in enumerate(types):
        if t in ("L", "R", "AL"):
            strong = t
        elif t == "EN" and strong == "AL":
            types[i] = "AN"
    # W3: AL -> R
    types = ["R" if t == "AL" else t for t in types]
    # W4: single ES between ENs -> EN; single CS between ENs/ANs -> that type
    for i in range(1, len(types) - 1):
        if types[i] == "ES" and types[i - 1] == "EN" and types[i + 1] == "EN":
            types[i] = "EN"
        elif types[i] == "CS" and types[i - 1] == types[i + 1] \
                and types[i - 1] in ("EN", "AN"):
            types[i] = types[i - 1]
    # W5: a run of ET adjacent to EN -> EN
    n = len(types)
    i = 0
    while i < n:
        if types[i] == "ET":
            j = i
            while j < n and types[j] == "ET":
                j += 1
            if (i > 0 and types[i - 1] == "EN") or (j < n and types[j] == "EN"):
                for k in range(i, j):
                    types[k] = "EN"
            i = j
        else:
            i += 1
    # W6: remaining separators/terminators -> ON
    types = ["ON" if t in ("ES", "ET", "CS") else t for t in types]
    # W7: EN -> L when the last strong type is L
    strong = sos
    for i, t in enumerate(types):
        if t in ("L", "R"):
            strong = t
        elif t == "EN" and strong == "L":
            types[i] = "L"

    # N1/N2: neutral runs take the surrounding direction when it agrees on
    # both sides (EN/AN count as R), else the embedding direction
    def _dir(t):
        return "R" if t in ("EN", "AN") else t

    i = 0
    while i < n:
        if types[i] in _NEUTRAL:
            j = i
            while j < n and types[j] in _NEUTRAL:
                j += 1
            left = _dir(types[i - 1]) if i > 0 else sos
            right = _dir(types[j]) if j < n else sos
            fill = left if left == right else ("R" if base else "L")
            for k in range(i, j):
                types[k] = fill
            i = j
        else:
            i += 1

    # I1/I2: implicit levels
    levels = []
    for t in types:
        if base == 0:
            levels.append(0 if t == "L" else (1 if t == "R" else 2))
        else:
            levels.append(1 if t == "R" else 2)
    # L1: trailing whitespace resets to the paragraph level
    for i in range(n - 1, -1, -1):
        if (unicodedata.bidirectional(text[i]) or "ON") in ("WS", "B", "S"):
            levels[i] = base
        else:
            break

    # L4: mirror glyphs on odd (RTL) levels, then L2: reverse level runs
    chars = [
        _MIRROR.get(ch, ch) if lvl % 2 else ch
        for ch, lvl in zip(text, levels)
    ]
    if levels:
        for lvl in range(max(levels), max(0, base), -1) if max(levels) else []:
            i = 0
            while i < n:
                if levels[i] >= lvl:
                    j = i
                    while j < n and levels[j] >= lvl:
                        j += 1
                    chars[i:j] = chars[i:j][::-1]
                    i = j
                else:
                    i += 1
        if base == 1:
            chars.reverse()
    return "".join(chars)


def fix_bidi_text(text: str) -> str:
    """X4: reorder RTL (Hebrew/Arabic) text for visual display, matching the
    reference's ``bidi.get_display`` on table-cell content. Uses python-bidi
    when installed; otherwise the built-in mini-UBA above (identical on the
    cell-level subset: strong runs, digits, separators, mirrors — no explicit
    embedding codes). Pure-LTR text is returned unchanged either way.

    Paragraph semantics (UAX #9 P1): each line gets its OWN base direction —
    a multi-line cell whose first line is English and second is Hebrew must
    render line 2 RTL. The reference reaches the same behavior by running
    ``get_display`` per extracted paragraph (extraction_service.py:50-57)."""
    if not text:
        return text or ""
    if "\n" in text:
        return "\n".join(fix_bidi_text(line) for line in text.split("\n"))
    if _bidi_get_display is not None:
        try:
            return _bidi_get_display(text)
        except Exception:  # reference wraps get_display the same way
            return text
    return _bidi_display(text)
