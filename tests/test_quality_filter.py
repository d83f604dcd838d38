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


def test_blocklist_filter_edges(spark, tmp_path):
    """Blocklist gate edge paths: hard-term any-hit drop, soft-rate boundary
    (exactly at threshold drops: strict <), zero-token doc drops (a doc
    with no alphabetic tokens has nothing worth keeping; 0 < 0 is false on
    both engines)."""
    from pdf_extractor_spark.operators.text_analysis import (
        q_blocklist_filter,
    )

    rows = [
        (1, "fast merge crash fast", "en", "s", 0),   # hard hit -> drop
        # 1 soft hit in 16 tokens = 62.5 -> floor 62 permille, 1000 < 16*60
        # is false (960) -> soft rate AT/over threshold -> drop
        (2, "slow " + "ok " * 15, "en", "s", 0),
        # 1 soft hit in 17 tokens: 1000 < 17*60 = 1020 -> keep
        (3, "slow " + "ok " * 16, "en", "s", 0),
        (4, "12345 --- 678", "en", "s", 0),           # zero tokens -> drop
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in q_blocklist_filter(spark, str(tmp_path)).collect()
    }
    assert (got[1]["n_hard_hits"], got[1]["keep"]) == (1, 0)
    assert (got[2]["soft_permille"], got[2]["keep"]) == (62, 0)
    assert (got[3]["soft_permille"], got[3]["keep"]) == (58, 1)
    assert (got[4]["n_tokens"], got[4]["soft_permille"], got[4]["keep"]) == (
        0, 0, 0,
    )
