"""Layout-JSON payload dialect — the second non-plain extraction dialect
behind the F2 router.

The reference routes queries to four genuinely different extraction
handlers with different conventions (mistral / azure-di / openai / gemini,
/root/reference/src/services/workflow_orchestrator.py:36-44); the azure-di
handler consumes a document-intelligence LAYOUT response (positioned blocks
with roles) rather than ready-made markdown
(/root/reference/src/services/azure_document_client.py). This kernel is
that dialect's analog: payloads are base64 JSON documents of pages ->
positioned blocks, and extraction is READING-ORDER RECONSTRUCTION from
coordinates plus role-based markdown rendering — a genuinely different
parser from the pseudo-PDF path (which splits ready markdown on page
separators).

Wire format (FIXTURES.md §1c): ``data:application/vnd.layout+json;base64,``
followed by base64 JSON::

    {"pages": [{"number": 1, "width": 612,
                "blocks": [{"x": 72, "y": 40, "role": "title",
                            "text": "..."}, ...]}]}

Conventions (deliberately different from the pdf dialect):
- blocks carry no order — the kernel derives two-column reading order from
  coordinates (left column top-to-bottom, then right column);
- roles render distinctly: title -> ``## `` heading, caption -> italics,
  footer/pageno -> dropped (layout-level boilerplate strip), paragraph and
  table text pass through;
- outlines come from title blocks (first title per page), not a TOC.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

LAYOUT_PAYLOAD_PREFIX = "data:application/vnd.layout+json;base64,"

_DROP_ROLES = {"footer", "pageno"}


class MalformedLayout(ValueError):
    """The payload parsed as JSON but violates the layout wire schema
    (non-dict page/block, non-numeric coordinate, non-string text).
    Malformed input is DATA, never a task failure: the extraction kernel
    catches this and emits a ``valid=False`` row with an
    ``invalid_layout_json`` problem — the same guardrail contract the pdf
    dialect honors for bad base64 / missing magic."""


def _coord(v, default: float = 0.0) -> float:
    """A JSON coordinate: absent/null falls back, any non-number (string,
    bool, list, ...) is a schema violation."""
    if v is None:
        return default
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise MalformedLayout(f"non-numeric coordinate: {v!r}")
    return float(v)


def reading_order(blocks: List[Dict], page_width: float) -> List[Dict]:
    """Two-column reading order: a block whose left edge sits past the page
    midline belongs to the right column; the left column reads first,
    top-to-bottom, ties broken left-to-right then by input index (fully
    deterministic for any input)."""
    def key(item: Tuple[int, Dict]):
        i, b = item
        col = 1 if _coord(b.get("x")) >= page_width / 2 else 0
        return (col, _coord(b.get("y")), _coord(b.get("x")), i)

    return [b for _, b in sorted(enumerate(blocks), key=key)]


def render_block(block: Dict) -> str:
    """Role-based markdown rendering; empty string means dropped."""
    raw = block.get("text")
    if raw is not None and not isinstance(raw, str):
        raise MalformedLayout(f"non-string block text: {raw!r}")
    text = (raw or "").strip()
    if not text:
        return ""
    role = block.get("role", "paragraph")
    if role is None:
        role = "paragraph"
    elif not isinstance(role, str):
        # an unhashable role (list/dict) would TypeError out of the set
        # membership test below — schema violation, same contract as text
        raise MalformedLayout(f"non-string block role: {role!r}")
    if role in _DROP_ROLES:
        return ""
    if role == "title":
        return "## " + text
    if role == "caption":
        return "*" + text + "*"
    return text  # paragraph / table


def layout_pages(doc: Dict) -> Tuple[List[Tuple[int, str]], List[Dict]]:
    """(pages, outlines) from a parsed layout document: each page's blocks
    in reading order rendered to one markdown body; the first title block
    per page becomes an outline entry. Page index is 0-based (payload
    ``number`` is 1-based, position is the fallback), pages sorted by it —
    same index contract as segment.split_pages."""
    pages: List[Tuple[int, str]] = []
    outlines: List[Dict] = []
    for pos, page in enumerate(doc.get("pages") or []):
        if not isinstance(page, dict):
            raise MalformedLayout(f"page is not an object: {page!r}")
        try:
            idx = int(page.get("number", pos + 1)) - 1
        except (TypeError, ValueError):
            idx = pos
        width = _coord(page.get("width"), 612.0) or 612.0
        blocks = page.get("blocks") or []
        if not isinstance(blocks, list) or any(
            not isinstance(b, dict) for b in blocks
        ):
            raise MalformedLayout("blocks is not a list of objects")
        ordered = reading_order(blocks, width)
        rendered = [render_block(b) for b in ordered]
        body = "\n\n".join(r for r in rendered if r)
        for b in ordered:
            if b.get("role") == "title" and (b.get("text") or "").strip():
                outlines.append(
                    {"title": b["text"].strip(), "page": idx}
                )
                break
        pages.append((idx, body))
    pages.sort(key=lambda p: p[0])
    outlines.sort(key=lambda o: o["page"])
    return pages, outlines
