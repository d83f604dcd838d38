"""DOM-heuristic HTML boilerplate stripping (main-content extraction).

The reference consumes extraction-service markdown rather than raw HTML, but
the graft's north rule requires an HTML boilerplate-strip stage: tag-density
and link-density scoring over a batched block stream (public-knowledge
heuristics in the boilerpipe/jusText family). Pure regex tokenizer — no
external parser dependencies — so it runs vectorized inside pandas UDFs.

Heuristics:
- drop <script>/<style>/<noscript> wholesale;
- drop blocks inside <nav>/<header>/<footer>/<aside>;
- split remaining markup into text blocks at block-level tag boundaries;
- keep a block when its visible text is >= MIN_BLOCK_CHARS, its link
  density (anchor-text chars / total chars) <= MAX_LINK_DENSITY, and its
  tag density (inline tags per visible char, boilerpipe-style) <=
  MAX_TAG_DENSITY — the latter catches markup-heavy widgets (menus of
  <span>s, button clusters) whose boilerplate carries no anchors;
- join kept blocks with blank lines; spans index into the joined result.
"""
from __future__ import annotations

import re
from typing import List, Tuple

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33
# tags per visible char; a paragraph with a few inline links sits ~0.02,
# a <span>-menu or button bar ~0.3+
MAX_TAG_DENSITY = 0.2

_DROP_REGIONS_RE = re.compile(
    r"<(script|style|noscript|nav|header|footer|aside)\b.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:p|div|h[1-6]|li|ul|ol|td|tr|table|article|section|main|blockquote|pre|br)\b[^>]*>",
    re.IGNORECASE,
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&#39;": "'", "&apos;": "'", "&nbsp;": " "}


def _unescape(text: str) -> str:
    for k, v in _ENTITIES.items():
        text = text.replace(k, v)
    return text


def _visible_text(fragment: str) -> str:
    return _WS_RE.sub(" ", _unescape(_TAG_RE.sub("", fragment))).strip()


def link_density(fragment: str) -> float:
    """Anchor-text chars / total visible chars of an HTML fragment."""
    total = _visible_text(fragment)
    if not total:
        return 0.0
    anchor_chars = sum(len(_visible_text(m)) for m in _ANCHOR_RE.findall(fragment))
    return min(1.0, anchor_chars / len(total))


def tag_density(fragment: str) -> float:
    """Inline tags per visible char (block-level tags were already consumed
    as split boundaries). High values mark markup-heavy boilerplate."""
    total = _visible_text(fragment)
    if not total:
        return 0.0
    return len(_TAG_RE.findall(fragment)) / len(total)


def extract_main_content(html: str) -> Tuple[str, List[Tuple[int, int]]]:
    """Strip boilerplate, returning (main_text, [(offset, length)] block spans
    into main_text). Deterministic; blocks joined with '\\n\\n'."""
    if not html:
        return "", []
    cleaned = _DROP_REGIONS_RE.sub("\n", html)
    kept: List[str] = []
    for fragment in _BLOCK_SPLIT_RE.split(cleaned):
        text = _visible_text(fragment)
        if len(text) < MIN_BLOCK_CHARS:
            continue
        if link_density(fragment) > MAX_LINK_DENSITY:
            continue
        if tag_density(fragment) > MAX_TAG_DENSITY:
            continue
        kept.append(text)
    spans: List[Tuple[int, int]] = []
    offset = 0
    for i, block in enumerate(kept):
        if i:
            offset += 2  # the '\n\n' joiner
        spans.append((offset, len(block)))
        offset += len(block)
    return "\n\n".join(kept), spans
