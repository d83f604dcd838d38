"""S5 dual-rule-set table scan: the lattice (bordered/pipe) and stream
(whitespace-aligned) flavors are genuinely different parsers, and the
cascade tries the requested flavor before falling back — parity with
extract_tables_camelot.py's try/except + alternative-flavor control flow."""
from pdf_extractor_spark.kernels.table_scan import (
    extract_tables_cascade,
    parse_table_lattice,
    parse_table_stream,
)

PIPE = "| H1 | H2 |\n| --- | --- |\n| a | 1 |\n| b | 2 |"
ALIGNED = "a  1\nb  2\nc  3"
PROSE = "just a sentence with single spaces and no structure"


def test_lattice_parses_pipes_only():
    assert parse_table_lattice(PIPE) == [["a", "1"], ["b", "2"]]
    assert parse_table_lattice(ALIGNED) == []
    assert parse_table_lattice(PROSE) == []


def test_stream_parses_alignment_only():
    assert parse_table_stream(ALIGNED) == [["a", "1"], ["b", "2"], ["c", "3"]]
    assert parse_table_stream(PIPE) == []  # pipe lines are lattice territory
    assert parse_table_stream(PROSE) == []


def test_stream_requires_consistent_columns():
    # rows disagree on column count -> rejected (camelot stream would score
    # such a region too low to report)
    assert parse_table_stream("a  1\nb  2  x") == []
    # a single aligned line is not a table
    assert parse_table_stream("a  1") == []


def test_cascade_prefers_requested_then_falls_back():
    assert extract_tables_cascade(PIPE)["method"] == "lattice"
    assert extract_tables_cascade(ALIGNED)["method"] == "stream"
    assert extract_tables_cascade(PROSE)["method"] == "none"
    # explicit stream-first on a pipe doc falls back to lattice
    r = extract_tables_cascade(PIPE, method="stream")
    assert r["method"] == "lattice" and r["rows"] == [["a", "1"], ["b", "2"]]


def test_cascade_empty_input():
    assert extract_tables_cascade("") == {"method": "none", "rows": []}
