"""Cross-page table merge + markdown render/parse + classification kernels.
Fixtures per FIXTURES.md §2/§6 and table_merger/table_validator semantics."""
from pdf_extractor_spark.kernels.classify import (
    classify_transactions,
    find_amount_columns,
    find_balance_column,
)
from pdf_extractor_spark.kernels.markdown_tables import (
    headers_match,
    parse_markdown_tables,
    render_merged_table,
)
from pdf_extractor_spark.kernels.table_merge import (
    merge_tables_across_pages,
    numerical_continuity,
)


def test_headers_match_normalized():
    assert headers_match(["Date ", " AMOUNT"], ["date", "amount"])
    assert not headers_match(["a"], ["a", "b"])


def test_render_single_page_caption():
    md = render_merged_table(["a", "b"], [["1", "2"]], 3, 3)
    assert md.startswith("**Table from Page 3**\n")
    assert "| a | b |" in md
    assert "| --- | --- |" in md
    assert md.endswith("| 1 | 2 |")


def test_render_pads_and_synthesizes_headers():
    md = render_merged_table(["a"], [["1", "2", "3"]], 1, 2)
    assert "**Table from Pages 1-2**" in md
    assert "| a | Col2 | Col3 |" in md


def test_parse_markdown_tables_roundtrip():
    md = "intro\n\n| h1 | h2 |\n| --- | --- |\n| a | 1 |\n| b | 2 |\n\ntail"
    tables = parse_markdown_tables(md)
    assert len(tables) == 1
    assert tables[0]["headers"] == ["h1", "h2"]
    assert tables[0]["rows"] == [["a", "1"], ["b", "2"]]


def test_parse_drops_width_mismatched_rows():
    md = "| h1 | h2 |\n| --- | --- |\n| a | 1 | extra |\n| b | 2 |"
    tables = parse_markdown_tables(md)
    assert tables[0]["rows"] == [["b", "2"]]


def _t(headers, rows, has_header=True):
    return {"headers": headers, "rows": rows, "has_header": has_header}


def test_merge_same_headers():
    merged = merge_tables_across_pages({
        1: [_t(["date", "amt"], [["1.1", "10"]])],
        2: [_t(["Date", "Amt"], [["2.1", "20"]])],
    })
    assert len(merged) == 1
    assert merged[0].data_rows == [["1.1", "10"], ["2.1", "20"]]
    assert (merged[0].start_page, merged[0].end_page) == (1, 2)


def test_merge_headerless_continuation_keeps_would_be_header():
    merged = merge_tables_across_pages({
        1: [_t(["date", "amt"], [["1.1", "10"]])],
        2: [_t(["2.1", "20"], [["3.1", "30"]], has_header=False)],
    })
    assert len(merged) == 1
    assert merged[0].data_rows == [["1.1", "10"], ["2.1", "20"], ["3.1", "30"]]


def test_merge_numerical_continuity():
    merged = merge_tables_across_pages({
        1: [_t(["date", "balance"], [["1.1", "1,000.00"]])],
        2: [_t(["x", "y"], [["2.1", "1,000.00"]])],  # same balance -> merge
    })
    assert len(merged) == 1


def test_no_merge_on_balance_jump():
    merged = merge_tables_across_pages({
        1: [_t(["date", "balance"], [["1.1", "1,000.00"]])],
        2: [_t(["x", "y"], [["2.1", "9,999.00"]])],  # >50% jump -> new table
    })
    assert len(merged) == 2


def test_numerical_continuity_edges():
    assert numerical_continuity(["a", "100.00"], ["b", "100.005"])  # within tol
    assert numerical_continuity(["a", "100.00"], ["b", "140.00"])  # <50% change
    assert not numerical_continuity(["a", "100.00"], ["b", "200.00"])  # 100%
    assert numerical_continuity(["a", "0"], ["b", "500.00"])  # zero start
    assert not numerical_continuity(["no nums"], ["b", "1"])


def test_find_balance_column_by_keyword():
    cols = ["Date", "Description", "יתרה מצטברת"]
    rows = [{c: "" for c in cols}]
    assert find_balance_column(cols, rows) == "יתרה מצטברת"


def test_classify_debit_credit_separate_columns():
    cols = ["date", "debit", "credit", "balance"]
    rows = [
        {"date": "1.1", "debit": "", "credit": "1,000.00", "balance": "1,000.00"},
        {"date": "2.1", "debit": "250.00", "credit": "", "balance": "750.00"},
        {"date": "3.1", "debit": "", "credit": "50.00", "balance": "800.00"},
    ]
    out = classify_transactions(cols, rows)
    assert out[0]["transaction_type"] == ""  # row 0 has no previous balance
    assert out[1]["transaction_type"] == "DEBIT"
    assert out[2]["transaction_type"] == "CREDIT"


def test_classify_combined_amount_column():
    # NB: dates must be digit-free — like the reference, parse_number strips
    # non-digits, so a "Jan 1" date column would win the >50%-numeric
    # amount-column inference (it iterates columns in order).
    cols = ["date", "amount", "balance"]
    rows = [
        {"date": "Jan first", "amount": "1,000.00", "balance": "1,000.00"},
        {"date": "Jan second", "amount": "250.00", "balance": "750.00"},   # debit
        {"date": "Jan third", "amount": "100.00", "balance": "850.00"},    # credit
        {"date": "Jan fourth", "amount": "999.00", "balance": "860.00"},   # unclear
    ]
    out = classify_transactions(cols, rows)
    assert out[1]["transaction_type"] == "DEBIT"
    assert out[2]["transaction_type"] == "CREDIT"
    assert out[3]["transaction_type"] == "UNCLEAR"
