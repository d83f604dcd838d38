"""Property-based tests (hypothesis) for the pure kernels — invariants that
fixed fixtures can't pin: idempotence, round-trips, span arithmetic, and
metamorphic relations. No Spark session needed."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.kernels.markdown_tables import (
    parse_markdown_tables,
    render_merged_table,
)
from pdf_extractor_spark.kernels.normalize import normalize_for_comparison
from pdf_extractor_spark.kernels.segment import (
    combine_markdown_sections,
    combine_with_spans,
)
from pdf_extractor_spark.kernels.similarity import calculate_similarity
from pdf_extractor_spark.kernels.textstats import (
    hamming64,
    shingles,
    simhash64,
)

text = st.text(max_size=300)
cell = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=8,
)


@given(text)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_for_comparison(s)
    assert normalize_for_comparison(once) == once


@given(st.lists(text, max_size=8))
@settings(max_examples=200, deadline=None)
def test_combine_spans_consistent(sections):
    combined, spans = combine_with_spans(sections)
    assert combined == combine_markdown_sections(sections)
    if len(sections) > 1:
        assert len(spans) == len(sections)
        for sec, (off, length) in zip(sections, spans):
            stripped = sec.strip()
            if not stripped:
                assert (off, length) == (-1, 0)
            else:
                assert combined[off:off + length] == stripped


@given(st.lists(st.lists(cell, min_size=2, max_size=4), min_size=1, max_size=6),
       st.lists(cell, min_size=2, max_size=4))
@settings(max_examples=100, deadline=None)
def test_markdown_render_parse_roundtrip(rows, headers):
    width = max(len(headers), max(len(r) for r in rows))
    md = render_merged_table(headers, rows, 1, 2)
    tables = parse_markdown_tables(md)
    assert len(tables) == 1
    parsed = tables[0]
    # render pads/trims every row to the max column count
    expected = [(list(r) + [""] * width)[:width] for r in rows]
    kept = [r for r in expected if len(r) == len(parsed["headers"])]
    assert parsed["rows"] == kept


@given(text)
@settings(max_examples=100, deadline=None)
def test_similarity_reflexive(s):
    assert calculate_similarity(s, s) == 1.0


@given(text, text)
@settings(max_examples=100, deadline=None)
def test_similarity_symmetric_range(a, b):
    sab = calculate_similarity(a, b)
    assert 0.0 <= sab <= 1.0


@given(text)
@settings(max_examples=100, deadline=None)
def test_simhash_self_distance_zero(s):
    assert hamming64(simhash64(s), simhash64(s)) == 0


@given(text)
@settings(max_examples=100, deadline=None)
def test_shingles_are_distinct_and_sorted(s):
    sh = shingles(s)
    assert sh == sorted(set(sh))
