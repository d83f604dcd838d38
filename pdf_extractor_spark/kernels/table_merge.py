"""Cross-page table merging with numerical (balance) continuity validation.

Parity targets:
- merge fold:  /root/reference/src/services/azure_di/table_merger.py:102-186
- continuity:  /root/reference/src/services/azure_di/table_validator.py:19-147

The merge decision for table T_i depends on the merged-so-far table (headers
inherit across headerless continuations), so this is an order-dependent fold —
run per-document inside ``groupBy(doc).applyInPandas`` on the Spark side.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..config import BALANCE_TOLERANCE, USE_NUMERICAL_VALIDATION
from .markdown_tables import headers_match, render_merged_table

_ROW_NUMBER_RE = re.compile(r"-?\d+(?:,\d{3})*(?:\.\d+)?")


@dataclass
class MergedTable:
    headers: List[str]
    start_page: int
    end_page: int
    data_rows: List[List[str]] = field(default_factory=list)

    def add_rows(self, rows: List[List[str]], page: int) -> None:
        self.data_rows.extend(rows)
        self.end_page = page

    def to_markdown(self) -> str:
        return render_merged_table(
            self.headers, self.data_rows, self.start_page, self.end_page
        )


def extract_row_numbers(row: List[str]) -> Tuple[List[float], List[Tuple[int, float]]]:
    """All numeric values in a row plus their (column_index, value) positions.
    US-format only (commas are thousands separators), per the reference."""
    amounts: List[float] = []
    positions: List[Tuple[int, float]] = []
    for idx, cell in enumerate(row):
        if not cell:
            continue
        for m in _ROW_NUMBER_RE.findall(str(cell).strip()):
            try:
                value = float(m.replace(",", ""))
            except ValueError:
                continue
            amounts.append(value)
            positions.append((idx, value))
    return amounts, positions


def numerical_continuity(
    previous_row: List[str],
    current_row: List[str],
    tolerance: float = BALANCE_TOLERANCE,
) -> bool:
    """True when two rows look like a continuous running-balance sequence:
    same balance within tolerance, <50% relative change, zero-start with
    |balance|<1M, or >=50% numeric-column position overlap."""
    prev_amounts, prev_pos = extract_row_numbers(previous_row)
    curr_amounts, curr_pos = extract_row_numbers(current_row)
    if not prev_amounts or not curr_amounts:
        return False

    prev_balance, curr_balance = prev_amounts[-1], curr_amounts[-1]
    diff = abs(curr_balance - prev_balance)
    if diff <= tolerance:
        return True
    if prev_balance != 0:
        return diff / abs(prev_balance) < 0.5
    if abs(curr_balance) < 1_000_000:
        return True

    prev_cols = {i for i, _ in prev_pos}
    curr_cols = {i for i, _ in curr_pos}
    if prev_cols and curr_cols:
        overlap = len(prev_cols & curr_cols)
        return overlap / max(len(prev_cols), len(curr_cols)) >= 0.5
    return False


def merge_tables_across_pages(
    tables_by_page: Dict[int, List[dict]],
    use_numerical_validation: bool = USE_NUMERICAL_VALIDATION,
) -> List[MergedTable]:
    """Ordered fold over (page, table) merging continuations.

    Each table dict: {'headers': [str], 'has_header': bool, 'rows': [[str]]}.
    Merge cases, in priority order: (1) first table starts; (2) same
    normalized headers; (3) headerless continuation (would-be header row is
    data); (4) numerical balance continuity; else a new merged table starts.
    """
    merged: List[MergedTable] = []
    prev: Optional[MergedTable] = None

    for page in sorted(tables_by_page):
        for table in tables_by_page[page]:
            headers = table.get("headers") or []
            rows = table.get("rows") or []
            has_header = table.get("has_header", bool(headers))

            if prev is None:
                prev = MergedTable(headers, page, page)
                prev.add_rows(rows, page)
                continue
            if headers and headers_match(prev.headers, headers):
                prev.add_rows(rows, page)
                continue
            if not has_header:
                all_rows = ([headers] + rows) if headers else rows
                prev.add_rows(all_rows, page)
                continue
            if (use_numerical_validation and prev.data_rows and rows
                    and numerical_continuity(prev.data_rows[-1], rows[0])):
                prev.add_rows(rows, page)
                continue
            merged.append(prev)
            prev = MergedTable(headers, page, page)
            prev.add_rows(rows, page)

    if prev is not None:
        merged.append(prev)
    return merged
