"""Corpus dashboard: duplicate accounting and split shares."""
from pdf_extractor_spark.operators.text_analysis import q_corpus_report


def test_duplicate_accounting(spark, tmp_path):
    rows = [
        (0, "alpha beta gamma", "en", "srcA", 16),
        (1, "alpha beta gamma", "en", "srcA", 16),   # exact dup of 0
        (2, "ALPHA, beta gamma!", "en", "srcA", 18),  # dup after normalize
        (3, "something else", "en", "srcA", 14),
        (4, "autre chose", "fr", "srcA", 11),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        (r["source"], r["lang"]): r
        for r in q_corpus_report(spark, str(tmp_path)).collect()
    }
    en = out[("srcA", "en")]
    assert en["n_docs"] == 4
    assert en["n_distinct"] == 2  # {alpha-beta-gamma, something-else}
    assert en["n_docs"] - en["n_distinct"] == 2  # the duplicate count
    assert out[("srcA", "fr")]["n_docs"] == 1
    assert 0 <= en["n_train"] <= en["n_docs"]
