"""Running-balance DEBIT/CREDIT classification + balance/amount column inference.

Parity target: /root/reference/scripts/classify_debit_credit.py:81-258.
Operates on plain lists of dict-rows so it is both the golden generator and
(via window expressions in operators/windows.py) cross-checked against the pure
Spark built-in implementation.
"""
from __future__ import annotations

from typing import Dict, List, Optional

from .numbers import parse_number

BALANCE_KEYWORDS = ["balance", "יתרה", "saldo", "solde", "reste", 'ח"שב']
AMOUNT_KEYWORDS = {
    "debit": ["debit", "חובה", "withdrawal", "retrait", "expense"],
    "credit": ["credit", "זכות", "deposit", "dépôt", "income"],
}


def find_balance_column(columns: List[str], rows: List[Dict]) -> Optional[str]:
    """Balance column by keyword, else the >70%-numeric column whose absolute
    diffs look cumulative (max diff < 100x mean diff)."""
    for col in columns:
        low = str(col).lower()
        if any(kw in low for kw in BALANCE_KEYWORDS):
            return col
    n = len(rows)
    if n == 0:
        return None
    for col in columns:
        values = [parse_number(str(r.get(col, ""))) for r in rows]
        numeric = [v for v in values if v is not None]
        if len(numeric) <= n * 0.7:
            continue
        diffs = [abs(b - a) for a, b in zip(numeric, numeric[1:])]
        if not diffs:
            continue
        avg = sum(diffs) / len(diffs)
        if avg > 0 and max(diffs) < avg * 100:
            return col
    return None


def find_amount_columns(columns: List[str], rows: List[Dict]) -> Dict[str, Optional[str]]:
    """Debit/credit columns by keyword; else the first >50%-numeric non-balance
    column as a combined 'amount' column."""
    result: Dict[str, Optional[str]] = {"debit": None, "credit": None, "amount": None}
    for col in columns:
        low = str(col).lower()
        if result["debit"] is None and any(k in low for k in AMOUNT_KEYWORDS["debit"]):
            result["debit"] = col
        if result["credit"] is None and any(k in low for k in AMOUNT_KEYWORDS["credit"]):
            result["credit"] = col
    balance_col = find_balance_column(columns, rows)
    n = len(rows)
    for col in columns:
        if col == balance_col:
            continue
        numeric = sum(parse_number(str(r.get(col, ""))) is not None for r in rows)
        if n and numeric > n * 0.5 and result["amount"] is None:
            result["amount"] = col
    return result


def classify_transactions(columns: List[str], rows: List[Dict]) -> List[Dict]:
    """Classify each row as DEBIT / CREDIT / UNCLEAR / '' via the running
    balance: balance[n] ~= balance[n-1] ± amount[n] within 1% of the diff.

    Returns rows augmented with 'transaction_type' and 'classified_amount'.
    Row 0 and rows with unparseable balances stay unclassified ('').
    """
    balance_col = find_balance_column(columns, rows)
    out = [dict(r, transaction_type="", classified_amount=None) for r in rows]
    if not balance_col:
        return out
    amount_cols = find_amount_columns(columns, rows)
    balances = [parse_number(str(r.get(balance_col, ""))) for r in rows]

    for i in range(1, len(rows)):
        prev_b, curr_b = balances[i - 1], balances[i]
        if prev_b is None or curr_b is None:
            continue
        amount = None
        if amount_cols["debit"] and amount_cols["credit"]:
            debit_val = parse_number(str(rows[i].get(amount_cols["debit"], "")))
            credit_val = parse_number(str(rows[i].get(amount_cols["credit"], "")))
            if debit_val and debit_val > 0:
                amount = debit_val
                out[i]["transaction_type"] = "DEBIT"
            elif credit_val and credit_val > 0:
                amount = credit_val
                out[i]["transaction_type"] = "CREDIT"
        elif amount_cols["amount"]:
            amount = parse_number(str(rows[i].get(amount_cols["amount"], "")))
            if amount is not None:
                diff = curr_b - prev_b
                tolerance = abs(diff) * 0.01
                if abs(diff - amount) < tolerance:
                    out[i]["transaction_type"] = "CREDIT"
                elif abs(diff + amount) < tolerance:
                    out[i]["transaction_type"] = "DEBIT"
                else:
                    out[i]["transaction_type"] = "UNCLEAR"
        if amount is not None:
            out[i]["classified_amount"] = amount
    return out
