"""Pin JVM-expression parity with the Python kernels on tricky inputs
(Unicode normalization, Jaccard, shingles, cosine) — the expressions are the
fast path, the kernels are the semantics."""
import math

from pyspark.sql import functions as F

from pdf_extractor_spark.functions.expressions import (
    cosine_similarity_expr,
    jaccard_words_expr,
    levenshtein_similarity_expr,
    normalize_for_comparison_expr,
    token_count_expr,
    word_shingles_expr,
    workflow_router_expr,
)
from pdf_extractor_spark.kernels.normalize import normalize_for_comparison
from pdf_extractor_spark.kernels.similarity import similarity_levenshtein
from pdf_extractor_spark.kernels.textstats import jaccard_words, shingles, token_count

SAMPLES = [
    "Hello, World! 123",
    "שלום עולם! 456 ₪",
    "under_score and-dash",
    "",
    "   spaced   out   ",
    "mixed עברית and English 3.14",
]


def test_normalize_expr_matches_kernel(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    got = [r["n"] for r in
           df.select(normalize_for_comparison_expr(F.col("t")).alias("n")).collect()]
    assert got == [normalize_for_comparison(s) for s in SAMPLES]


def test_levenshtein_expr_matches_kernel(spark):
    pairs = [(a, b) for a in SAMPLES[:4] for b in SAMPLES[:4]]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [r["s"] for r in
           df.select(levenshtein_similarity_expr(F.col("a"), F.col("b")).alias("s")).collect()]
    for (a, b), g in zip(pairs, got):
        k = similarity_levenshtein(a, b)
        na, nb = normalize_for_comparison(a), normalize_for_comparison(b)
        if not na and not nb:
            assert g == 1.0
        elif not a or not b:
            # expr operates on normalized text only; kernel has a raw-empty
            # pre-check — both yield 0/1 on these samples
            assert g in (0.0, 1.0)
        else:
            assert math.isclose(g, k, abs_tol=1e-9), (a, b)


def test_jaccard_expr_matches_kernel(spark):
    pairs = [("a b c", "a b c"), ("a b", "c d"), ("x y z w", "y z q")]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [r["j"] for r in
           df.select(jaccard_words_expr(F.col("a"), F.col("b")).alias("j")).collect()]
    for (a, b), g in zip(pairs, got):
        assert math.isclose(g, jaccard_words(a, b), abs_tol=1e-9)


def test_token_count_expr_matches_kernel(spark):
    texts = ["hello world, 42!", "a-b.c 12 34x", ""]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["n"] for r in df.select(token_count_expr(F.col("t")).alias("n")).collect()]
    assert got == [token_count(t) for t in texts]


def test_shingles_expr_matches_kernel(spark):
    texts = ["a b c d e", "a b", "one", ""]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [sorted(r["s"]) for r in
           df.select(word_shingles_expr(F.col("t")).alias("s")).collect()]
    assert got == [sorted(shingles(t)) for t in texts]


def test_workflow_router_expr(spark):
    df = spark.createDataFrame(
        [("please run 04_Bank_Statements now",), ("02_Trial_Balance q",),
         ("nothing special",), ("",), (None,)],
        "q string",
    )
    got = [r["w"] for r in df.select(workflow_router_expr(F.col("q")).alias("w")).collect()]
    assert got == ["text_extraction", "azure_document_intelligence",
                   "mistral", "mistral", "mistral"]


def test_cosine_expr(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = [r["c"] for r in
           df.select(cosine_similarity_expr(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == 1.0 and got[1] == 0.0 and got[2] == 0.0
