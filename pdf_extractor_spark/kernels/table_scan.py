"""S5: dual-rule-set table scan — the camelot lattice/stream flavor cascade.

Parity target: /root/reference/scripts/extract_tables_camelot.py:29-38 —
try the requested flavor; when it produces no tables (or errors), fall back
to the alternative flavor and report which one won. The two flavors are
genuinely different rule sets, mirroring camelot's semantics at text level:

- ``lattice``: tables with explicit borders. Here the border marks are the
  pipe delimiters of a markdown table (header + separator + data rows,
  parsed by kernels.markdown_tables.parse_markdown_tables).
- ``stream``: borderless whitespace-aligned tables — lines split on runs of
  >= 2 spaces, accepted only when >= 2 rows agree on the column count
  (camelot's stream mode infers columns from whitespace alignment).
"""
from __future__ import annotations

import re
from typing import Dict, List

from .markdown_tables import parse_markdown_tables

_STREAM_SPLIT_RE = re.compile(r"\s{2,}")


def parse_table_lattice(text: str) -> List[List[str]]:
    """Bordered-table rule set: first markdown pipe table's data rows."""
    tables = parse_markdown_tables(text or "")
    return tables[0]["rows"] if tables else []


def parse_table_stream(text: str) -> List[List[str]]:
    """Borderless rule set: whitespace-aligned columns. A line is a candidate
    row when splitting on >= 2 spaces yields >= 2 cells; the table is accepted
    only when at least 2 candidate rows agree on the column count."""
    rows: List[List[str]] = []
    for ln in (text or "").splitlines():
        s = ln.strip()
        if not s or "|" in s:
            continue
        cells = _STREAM_SPLIT_RE.split(s)
        if len(cells) >= 2:
            rows.append(cells)
    if len(rows) >= 2 and len({len(r) for r in rows}) == 1:
        return rows
    return []


_FLAVORS = {"lattice": parse_table_lattice, "stream": parse_table_stream}


def extract_tables_cascade(text: str, method: str = "lattice") -> Dict:
    """Flavor cascade: requested flavor first, alternative on zero tables,
    ``method='none'`` when both fail. Returns {'method', 'rows'}."""
    order = [method, "stream" if method == "lattice" else "lattice"]
    for flavor in order:
        rows = _FLAVORS[flavor](text)
        if rows:
            return {"method": flavor, "rows": rows}
    return {"method": "none", "rows": []}
