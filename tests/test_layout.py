"""Layout-JSON dialect kernel: coordinate reading-order reconstruction,
role-based rendering, guardrails — the second routed extraction dialect
(reference analog: the azure-di layout handler among the four routed
handlers, workflow_orchestrator.py:36-44)."""
import base64
import json

from pdf_extractor_spark.kernels.layout import (
    LAYOUT_PAYLOAD_PREFIX,
    layout_pages,
    reading_order,
    render_block,
)
from pdf_extractor_spark.kernels.segment import extract_turn


def _payload(doc) -> str:
    return LAYOUT_PAYLOAD_PREFIX + base64.b64encode(
        json.dumps(doc).encode()
    ).decode()


def test_two_column_reading_order():
    blocks = [
        {"x": 320, "y": 100, "text": "right-top"},
        {"x": 72, "y": 200, "text": "left-bottom"},
        {"x": 72, "y": 100, "text": "left-top"},
        {"x": 320, "y": 200, "text": "right-bottom"},
    ]
    got = [b["text"] for b in reading_order(blocks, 612)]
    assert got == ["left-top", "left-bottom", "right-top", "right-bottom"]


def test_reading_order_ties_are_deterministic():
    blocks = [{"x": 72, "y": 100, "text": t} for t in ("a", "b", "c")]
    assert [b["text"] for b in reading_order(blocks, 612)] == ["a", "b", "c"]


def test_role_rendering():
    assert render_block({"role": "title", "text": " T "}) == "## T"
    assert render_block({"role": "caption", "text": "c"}) == "*c*"
    assert render_block({"role": "paragraph", "text": "p"}) == "p"
    assert render_block({"role": "table", "text": "| a |"}) == "| a |"
    assert render_block({"role": "footer", "text": "page 3"}) == ""
    assert render_block({"role": "paragraph", "text": "  "}) == ""


def test_layout_pages_order_and_outlines():
    doc = {"pages": [
        {"number": 2, "width": 612, "blocks": [
            {"x": 72, "y": 40, "role": "paragraph", "text": "second page"},
        ]},
        {"number": 1, "width": 612, "blocks": [
            {"x": 72, "y": 40, "role": "title", "text": "Intro"},
            {"x": 72, "y": 100, "role": "paragraph", "text": "body"},
        ]},
    ]}
    pages, outlines = layout_pages(doc)
    assert [idx for idx, _ in pages] == [0, 1]
    assert pages[0][1] == "## Intro\n\nbody"
    assert outlines == [{"title": "Intro", "page": 0}]


def test_extract_turn_layout_end_to_end():
    doc = {"pages": [{"number": 1, "width": 612, "blocks": [
        {"x": 72, "y": 40, "role": "title", "text": "Report"},
        {"x": 320, "y": 90, "role": "paragraph", "text": "right column"},
        {"x": 72, "y": 90, "role": "paragraph", "text": "left column"},
        {"x": 72, "y": 760, "role": "footer", "text": "confidential"},
    ]}]}
    r = extract_turn("prose then " + _payload(doc))
    assert r["kind"] == "layout" and r["valid"]
    assert r["n_pages"] == 1
    assert r["extracted_text"] == (
        "# Page 1\n\n## Report\n\nleft column\n\nright column"
    )
    assert r["sections"] == [
        {"title": "Report", "page": 0, "end_page": 1, "chunk_indices": [0]}
    ]


def test_extract_turn_layout_guardrails():
    bad_b64 = LAYOUT_PAYLOAD_PREFIX + "ABCDE"  # length % 4 != 0
    r = extract_turn(bad_b64)
    assert not r["valid"] and r["problems"] == ["invalid_base64"]

    not_json = LAYOUT_PAYLOAD_PREFIX + base64.b64encode(b"nope").decode()
    r = extract_turn(not_json)
    assert not r["valid"] and r["problems"] == ["invalid_layout_json"]

    wrong_shape = _payload({"blocks": []})
    r = extract_turn(wrong_shape)
    assert not r["valid"] and r["problems"] == ["invalid_layout_json"]


def test_extract_turn_layout_schema_violations_are_data():
    """Deeper malformation than 'pages is not a list': non-dict pages,
    non-dict blocks, non-numeric coordinates, non-string text. Each must
    come back valid=False/invalid_layout_json — never an escaped
    AttributeError/ValueError failing the Spark task."""
    cases = [
        {"pages": ["not a page"]},
        {"pages": [{"number": 1, "blocks": "not a list"}]},
        {"pages": [{"number": 1, "blocks": ["not a block"]}]},
        {"pages": [{"number": 1, "blocks": [{"x": "abc", "y": 0, "text": "t"}]}]},
        {"pages": [{"number": 1, "blocks": [{"x": 0, "y": [], "text": "t"}]}]},
        {"pages": [{"number": 1, "width": "foo", "blocks": []}]},
        {"pages": [{"number": 1, "blocks": [{"x": 0, "y": 0, "text": 7}]}]},
        {"pages": [{"number": 1, "blocks": [{"x": True, "y": 0, "text": "t"}]}]},
    ]
    for doc in cases:
        r = extract_turn(_payload(doc))
        assert not r["valid"], doc
        assert r["problems"] == ["invalid_layout_json"], doc


def test_layout_null_coords_default_to_zero():
    """Absent/null coordinates are fine (fall back to 0/612), only
    non-numeric values are schema violations."""
    r = extract_turn(
        _payload({"pages": [{"blocks": [{"text": "hello", "y": None}]}]})
    )
    assert r["valid"]
    assert "hello" in r["extracted_text"]


def test_layout_non_string_role_is_data():
    r = extract_turn(
        _payload(
            {"pages": [{"blocks": [{"text": "t", "role": []}]}]}
        )
    )
    assert not r["valid"] and r["problems"] == ["invalid_layout_json"]
    # absent / null roles stay fine (default paragraph)
    r2 = extract_turn(
        _payload({"pages": [{"blocks": [{"text": "ok", "role": None}]}]})
    )
    assert r2["valid"] and "ok" in r2["extracted_text"]
