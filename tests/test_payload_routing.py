"""Payload-kind routing: the kernel and its JVM expression twin must agree,
and prose that merely *mentions* markup must stay plain (code-review
regression: '<html' anywhere used to swallow the whole turn)."""
from pyspark.sql import functions as F

from pdf_extractor_spark.kernels.segment import detect_payload_kind, extract_turn
from pdf_extractor_spark.plans.pipeline import extract_transcripts

CASES = [
    ("start with the <html> tag, then add <head>", "plain"),
    ("prose then <html><body><p>%s</p></body></html>" % ("content " * 10), "html"),
    ("<!DOCTYPE HTML><html><body><p>%s</p></body></html>" % ("x " * 30), "html"),
    ("</html> alone is not a document", "plain"),
    ("see data:application/pdf;base64,aGVsbG8= inline", "pdf"),
    ("plain words only", "plain"),
    ("", "plain"),
    # pdf prefix wins even when html markers are present
    ("data:application/pdf;base64,QUJD <html></html>", "pdf"),
    # layout dialect routes distinctly, and wins over pdf/html markers
    ("see data:application/vnd.layout+json;base64,e30= inline", "layout"),
    ("data:application/vnd.layout+json;base64,e30= and "
     "data:application/pdf;base64,QUJD <html></html>", "layout"),
]


def test_kernel_kind_detection():
    for text, expected in CASES:
        assert detect_payload_kind(text) == expected, text[:40]


def test_mentioning_html_keeps_text_verbatim():
    text = "To build a page, start with the <html> tag, then add <head> and <body>."
    r = extract_turn(text)
    assert r["kind"] == "plain"
    assert r["extracted_text"] == text


def test_router_expr_matches_kernel(spark):
    rows = [("c", i, "assistant", t, None, None) for i, (t, _) in enumerate(CASES)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        r["turn_idx"]: r["kind"]
        for r in extract_transcripts(df).select("turn_idx", "kind").collect()
    }
    for i, (text, expected) in enumerate(CASES):
        assert got[i] == expected, text[:40]
