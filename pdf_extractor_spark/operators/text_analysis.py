"""Text-analysis operators over ``documents``: token counting, quality
features, md5 fingerprinting (oracle-checked), plus heuristic language ID and
FNV fingerprints (UDF-backed, rows-only checks).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.expressions import normalize_for_comparison_expr, token_count_expr
from ..functions.udfs import detect_language_udf, quality_score_udf


def _docs(spark, sf_dir):
    from . import load
    return load(spark, sf_dir, "documents")


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counts, JVM-side regex — no Python."""
    return _docs(spark, sf_dir).select(
        "doc_id", token_count_expr(F.col("text")).alias("n_tokens")
    )


def q_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring feature vector: char/word counts + alpha ratio."""
    docs = _docs(spark, sf_dir)
    n_chars = F.length("text")
    n_words = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    n_alpha = F.length(F.regexp_replace("text", r"[^\p{L}]+", ""))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_text"),
        n_words.alias("n_words"),
        F.round(n_alpha / n_chars, 6).alias("alpha_ratio"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 document fingerprint over normalized text (dedup/lineage key)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(normalize_for_comparison_expr(F.col("text"))).alias("fingerprint"),
    )


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword/script language ID (UDF kernel; rows-only driver
    check — semantics pinned by kernel unit tests) plus quality score."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        detect_language_udf(F.col("text")).alias("lang_guess"),
        F.round(quality_score_udf(F.col("text")), 6).alias("quality"),
    )


ORACLES = {
    "token_count": """
        SELECT doc_id,
               len(list_filter(
                   string_split(regexp_replace(text,
                       '([A-Za-z]+|\\d+|[^\\sA-Za-z\\d])', '\\1 ', 'g'), ' '),
                   x -> trim(x) <> '')) AS n_tokens
        FROM documents
    """,
    "quality_features": """
        SELECT doc_id,
               length(text) AS n_chars_text,
               len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
                   AS n_words,
               round(length(regexp_replace(text, '[^\\p{L}]+', '', 'g'))::DOUBLE
                     / length(text), 6) AS alpha_ratio
        FROM documents
    """,
    "fingerprint": """
        SELECT doc_id,
               md5(lower(regexp_replace(text, '[^\\p{L}\\p{N}]+', '', 'g')))
                   AS fingerprint
        FROM documents
    """,
}

QUERIES = {
    "token_count": q_token_count,
    "quality_features": q_quality_features,
    "fingerprint": q_fingerprint,
    "language_id": q_language_id,
}
