"""End-to-end training-data pipeline: transcripts in, training-ready
corpus out.

Composes the engine's stages the way a real data-curation job would:

    extract (payload-routed Arrow kernel)
      -> assemble per-conversation markdown
      -> Gopher-style quality gate (exact integer rules)
      -> PII redaction (email / IPv4 / card placeholders)
      -> exact dedup (md5 of normalized text, keep min conv_id)
      -> deterministic holdout split (content-stable md5 buckets)

Everything between the two ends is a pure JVM map or a single hash
aggregation — the only shuffles are the assembly regroup and the dedup
groupBy, both keyed, both AQE-managed. Each stage is individually
oracle-checked via its `queries()` twin; this module pins that they
compose (tests/test_training_data.py + the /verify drive)."""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expressions import normalize_for_comparison_expr
from ..operators.text_ops import PII_PATTERNS, SPLIT_TEST_PCT, SPLIT_VAL_PCT
from .pipeline import assemble_conversations, extract_transcripts

# Gopher gates, cross-multiplied integer form (operators.text_analysis
# documents the rules; conversations are longer than single documents, so
# the word floor is higher)
MIN_WORDS = 20
MAX_WORDS = 1_000_000


def curate(transcripts: DataFrame) -> DataFrame:
    """Transcripts -> one row per kept conversation:
    (conv_id, split, text, n_words, n_turns, total_pages)."""
    assembled = assemble_conversations(extract_transcripts(transcripts))

    ws = F.filter(
        F.split("conversation_markdown", r"\s+"), lambda x: x != ""
    )
    scored = assembled.select(
        "conv_id",
        "n_turns",
        "total_pages",
        F.col("conversation_markdown").alias("text"),
        F.size(ws).alias("n_words"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("sum_chars"),
        F.size(F.filter(ws, lambda w: w.rlike(r"\p{L}"))).alias(
            "n_alpha_words"
        ),
    )
    kept = scored.where(
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS)
        & (F.col("sum_chars") >= 3 * F.col("n_words"))
        & (F.col("sum_chars") <= 12 * F.col("n_words"))
        & (5 * F.col("n_alpha_words") >= 4 * F.col("n_words"))
    )

    red = F.col("text")
    for kind, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    redacted = kept.withColumn("text", red)

    # exact dedup on normalized content: keep the lowest conv_id per key
    key = F.md5(normalize_for_comparison_expr(F.col("text")))
    w_rank = F.row_number().over(
        Window.partitionBy("content_key").orderBy("conv_id")
    )
    deduped = (
        redacted.withColumn("content_key", key)
        .withColumn("rk", w_rank)
        .where(F.col("rk") == 1)
        .drop("rk", "content_key", "sum_chars", "n_alpha_words")
    )

    bucket = (
        F.conv(
            F.substring(F.md5(F.col("conv_id")), 1, 4), 16, 10
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < SPLIT_VAL_PCT, "val")
        .when(bucket < SPLIT_VAL_PCT + SPLIT_TEST_PCT, "test")
        .otherwise("train")
    )
    return deduped.select(
        "conv_id", split.alias("split"), "text", "n_words", "n_turns",
        "total_pages",
    )
