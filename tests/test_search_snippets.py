"""KWIC snippets: earliest term wins (ties to query-term order), the
window clamps at the text start, snippet content is exact."""
from pdf_extractor_spark.operators.retrieval import (
    QUERY_TERMS,
    SNIPPET_RADIUS,
    q_search_snippets,
)


def _write(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_earliest_term_and_clamped_window(spark, tmp_path):
    t0, t1 = QUERY_TERMS[0], QUERY_TERMS[1]
    # doc 1: t1 appears first (position 1 -> window clamps at start);
    # doc 2: only t0, deep enough for a full two-sided window
    pad = "x" * 50
    sf = _write(spark, tmp_path, [
        (1, f"{t1} then later {t0} appears", "en", "s", 10),
        (2, f"{pad} {t0} {pad}", "en", "s", 10),
    ])
    got = {r["doc_id"]: r for r in q_search_snippets(spark, sf).collect()}
    assert got[1]["term"] == t1 and got[1]["pos"] == 1
    assert got[1]["snippet"].startswith(t1)
    r2 = got[2]
    assert r2["term"] == t0 and r2["pos"] == 52
    assert len(r2["snippet"]) == 2 * SNIPPET_RADIUS + len(t0)
    # the matched term sits exactly RADIUS chars into the snippet
    assert r2["snippet"][SNIPPET_RADIUS:SNIPPET_RADIUS + len(t0)] == t0


def test_earliest_position_wins_with_both_terms_present(spark, tmp_path):
    t0, t1 = QUERY_TERMS[0], QUERY_TERMS[1]
    # both terms tokenized in the doc; the snippet anchors on whichever
    # occurs first in the raw text (here t0 at position 1)
    sf = _write(spark, tmp_path, [
        (1, f"{t0} {t1} tail", "en", "s", 10),
    ])
    rows = q_search_snippets(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["term"] == t0 and rows[0]["pos"] == 1
