"""Span-level decontamination: remove exactly the words covered by a
benchmark-overlapping 3-shingle, keep everything else in order."""
import pyspark.sql.functions as F

from pdf_extractor_spark.operators.dedup import (
    _positional_shingles_col,
    decontaminate_spans,
)


def _run(spark, bench_texts, corpus):
    """bench_texts: list[str]; corpus: dict[doc_id -> text]."""
    docs = spark.createDataFrame(
        [(-(i + 1), t) for i, t in enumerate(bench_texts)]
        + list(corpus.items()),
        "doc_id long, text string",
    )
    sh = docs.select(
        "doc_id", F.posexplode(_positional_shingles_col()).alias("start", "sh")
    )
    bench_sh = sh.where(F.col("doc_id") < 0).select("sh").distinct()
    corpus_sh = sh.where(F.col("doc_id") >= 0)
    base = docs.where(F.col("doc_id") >= 0).select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("ws"),
    )
    return {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["clean_text"])
        for r in decontaminate_spans(corpus_sh, bench_sh, base).collect()
    }


def test_contaminated_span_removed_clean_rest_kept(spark):
    got = _run(
        spark,
        ["alpha beta gamma"],
        {0: "intro words alpha beta gamma closing words"},
    )
    # words 2,3,4 covered by the bench shingle
    assert got[0] == (7, 3, "intro words closing words")


def test_overlapping_shingles_cover_union(spark):
    # bench has "a b c" and "c d e": corpus "x a b c d e y" hits both at
    # starts 1 and 3 -> covered {1..5}, keeping x and y.
    got = _run(spark, ["a b c d e"], {0: "x a b c d e y"})
    assert got[0] == (7, 5, "x y")


def test_untouched_doc_passes_through(spark):
    got = _run(spark, ["alpha beta gamma"], {0: "totally unrelated words here"})
    assert got[0] == (4, 0, "totally unrelated words here")


def test_fully_contaminated_doc_empties(spark):
    got = _run(spark, ["p q r"], {0: "p q r"})
    assert got[0] == (3, 3, "")


def test_short_docs_have_no_shingles(spark):
    # a 2-word doc can't match any 3-shingle even if its words appear
    got = _run(spark, ["p q r"], {0: "p q"})
    assert got[0] == (2, 0, "p q")
