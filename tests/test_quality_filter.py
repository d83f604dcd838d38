"""Gopher-style quality gates (text_analysis.q_gopher_quality) — the sf
corpus is clean prose (all kept), so crafted cases pin the reject paths."""
import pdf_extractor_spark.operators.text_analysis as T


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = T._docs
    T._docs = lambda s, d: df
    try:
        return {
            r["doc_id"]: r for r in T.q_gopher_quality(spark, "x").collect()
        }
    finally:
        T._docs = orig


def test_reject_paths(spark):
    got = _run(spark, [
        (1, "- a\n- b\n- c"),                       # all bullet lines
        (2, "word " * 100),                          # clean prose
        (3, "@@ ## $$ %% ^^ &&"),                    # no alphabetic words
        (4, "a b c d e f g h i j"),                  # mean word length 1 < 3
        (5, "tiny"),                                 # under 5 words
        (6, "supercalifragilisticexpialidocious " * 20),  # mean length > 10
    ])
    assert got[2]["keep"] is True
    for doc in (1, 3, 4, 5, 6):
        assert got[doc]["keep"] is False, doc


def test_counts_exact(spark):
    got = _run(spark, [(1, "alpha beta2 42 -x\n- bullet line\nplain")])
    r = got[1]
    assert r["n_words"] == 8  # "-" is its own whitespace token
    assert r["n_lines"] == 3
    assert r["n_bullet_lines"] == 1  # only "- bullet line"
    assert r["n_alpha_words"] == 6  # all but "42" and "-"
