"""Markdown table render (X8) and parse (X9) kernels.

Parity targets:
- render: /root/reference/src/services/azure_di/table_merger.py:38-92,236-272
- parse:  /root/reference/scripts/classify_debit_credit.py:261-310
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional

# NOTE: the reference's separator regex (classify_debit_credit.py:287) only
# matches single-column separators; this one implements the evident intent and
# drops any all-dash separator row regardless of column count.
_SEPARATOR_ROW_RE = re.compile(r"^\s*\|(?:[\s\-:]*\|)+\s*$")


def render_merged_table(
    headers: List[str],
    data_rows: List[List[str]],
    start_page: int,
    end_page: int,
) -> str:
    """Render a (possibly cross-page) table to markdown with a page-range
    caption, Col{n} synthesized headers, and pad/trim to max column count."""
    if not headers and not data_rows:
        return ""
    max_cols = len(headers) if headers else 0
    for row in data_rows:
        max_cols = max(max_cols, len(row))
    adjusted = list(headers) if headers else []
    while len(adjusted) < max_cols:
        adjusted.append(f"Col{len(adjusted) + 1}")

    lines = []
    if start_page == end_page:
        lines.append(f"**Table from Page {start_page}**\n")
    else:
        lines.append(f"**Table from Pages {start_page}-{end_page}**\n")
    lines.append("| " + " | ".join(adjusted) + " |")
    lines.append("| " + " | ".join(["---"] * len(adjusted)) + " |")
    for row in data_rows:
        padded = (list(row) + [""] * max_cols)[:max_cols]
        lines.append("| " + " | ".join(padded) + " |")
    return "\n".join(lines)


def parse_markdown_tables(content: str) -> List[Dict]:
    """Extract tables from markdown: contiguous pipe-line runs; drop separator
    rows; first row is the header; keep only data rows matching header width.

    Returns a list of dicts: {'number', 'headers', 'rows', 'line_start', 'line_end'}.
    """
    tables: List[Dict] = []
    lines = content.split("\n")
    current: List[str] = []
    in_table = False
    table_num = 0

    def flush(end_idx: int) -> None:
        nonlocal current, in_table
        if in_table and current:
            body = [ln for ln in current if not _SEPARATOR_ROW_RE.match(ln)]
            if len(body) > 1:
                headers = [c.strip() for c in body[0].split("|")[1:-1]]
                rows = []
                for ln in body[1:]:
                    row = [c.strip() for c in ln.split("|")[1:-1]]
                    if len(row) == len(headers):
                        rows.append(row)
                tables.append({
                    "number": table_num,
                    "headers": headers,
                    "rows": rows,
                    "line_start": end_idx - len(current),
                    "line_end": end_idx,
                })
        current = []
        in_table = False

    for i, line in enumerate(lines):
        if "|" in line and line.strip():
            if not in_table:
                in_table = True
                table_num += 1
                current = [line]
            else:
                current.append(line)
        else:
            flush(i)
    flush(len(lines))
    return tables


def headers_match(headers1: List[str], headers2: List[str]) -> bool:
    """Case-insensitive, whitespace-normalized elementwise header equality."""
    if len(headers1) != len(headers2):
        return False
    return [h.strip().lower() for h in headers1] == [h.strip().lower() for h in headers2]
