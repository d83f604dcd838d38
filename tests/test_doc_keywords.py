"""Per-doc tf-idf keywords: rare terms outrank common ones, the alpha
length-3 filter drops digits/short tokens, ties break on the term."""
from pdf_extractor_spark.operators.text_analysis import q_doc_keywords


def _write(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_rare_term_outranks_ubiquitous(spark, tmp_path):
    # "common" appears in every doc; "zebra" only in doc 1 — same tf, the
    # rare term must score higher. "ab" and "42" never qualify.
    sf = _write(spark, tmp_path, [
        (1, "common zebra ab 42", "en", "s", 10),
        (2, "common filler", "en", "s", 10),
        (3, "common filler", "en", "s", 10),
    ])
    rows = q_doc_keywords(spark, sf).where("doc_id = 1").orderBy("rk").collect()
    assert [r["term"] for r in rows] == ["zebra", "common"]
    assert rows[0]["df"] == 1 and rows[1]["df"] == 3
    assert rows[0]["score"] > rows[1]["score"]
    assert all(r["term"] not in ("ab", "42") for r in rows)


def test_tf_breaks_equal_df(spark, tmp_path):
    # both terms unique to doc 1; the higher-tf one wins
    sf = _write(spark, tmp_path, [
        (1, "alpha alpha beta", "en", "s", 10),
        (2, "filler", "en", "s", 10),
    ])
    rows = q_doc_keywords(spark, sf).where("doc_id = 1").orderBy("rk").collect()
    assert [r["term"] for r in rows] == ["alpha", "beta"]
    assert rows[0]["tf"] == 2
