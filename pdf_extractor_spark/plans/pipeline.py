"""The flagship extraction pipeline: transcripts -> per-turn extraction ->
per-conversation assembly + validation rollup.

Spark-first layout of the reference's EP2 lifecycle (SURVEY.md §3):
    read -> guardrail filter -> salted repartition (skew) -> extract UDF
    -> per-turn result table
    -> window-ordered per-conversation assembly (byte-exact combine)
    -> validation report aggregate (A3/A4)

Scale notes (10^12 turns):
- The per-turn map is embarrassingly parallel; ``repartition(N, conv_id,
  salt)`` spreads a single 200-turn conversation with 40-page payloads over
  many tasks (long-document skew, SURVEY.md §4.1).
- The only true shuffle is the final per-conversation regroup; AQE coalesces
  its output partitions.
- Per-turn results are written (and resumable) independently of assembly, so
  the expensive stage is checkpointed before the shuffle.
"""
from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import (
    VALIDATION_COST_PER_1K_TOKENS,
    VALIDATION_TOKENS_PER_PAGE,
)
from ..functions.udfs import EXTRACTION_TYPE, extract_turn_udf
from ..kernels.segment import combine_markdown_sections


def extract_transcripts(
    transcripts: DataFrame,
    salt_partitions: Optional[int] = None,
) -> DataFrame:
    """Per-turn extraction map. Returns one row per input turn:

    conv_id, turn_idx, role, kind, n_pages, extracted_text, spans, problems,
    sections, repaired_pages, valid, n_chars
    """
    df = transcripts
    if salt_partitions:
        # Salt on (conv_id, turn_idx) so one huge conversation spreads across
        # tasks; the assembly groupBy below re-gathers per conv_id.
        df = df.repartition(salt_partitions, "conv_id", "turn_idx")
    result = df.withColumn("x", extract_turn_udf(F.col("text")))
    return result.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("x.kind").alias("kind"),
        F.col("x.n_pages").alias("n_pages"),
        F.col("x.extracted_text").alias("extracted_text"),
        F.col("x.spans").alias("spans"),
        F.col("x.problems").alias("problems"),
        F.col("x.sections").alias("sections"),
        F.col("x.repaired_pages").alias("repaired_pages"),
        F.col("x.valid").alias("valid"),
        F.length("x.extracted_text").alias("n_chars"),
    )


ASSEMBLY_SCHEMA = (
    "conv_id string, n_turns int, conversation_markdown string, "
    "total_pages long, problem_turns int, repaired_pages int"
)


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map assembly kernel: byte-exact combine of per-turn extracted
    text in stable turn order (A1 semantics via the shared kernel)."""
    pdf = pdf.sort_values("turn_idx")
    combined = combine_markdown_sections(list(pdf["extracted_text"]))
    return pd.DataFrame([{
        "conv_id": pdf["conv_id"].iloc[0],
        "n_turns": int(len(pdf)),
        "conversation_markdown": combined,
        "total_pages": int(pdf["n_pages"].sum()),
        "problem_turns": int((pdf["problems"].map(len) > 0).sum()),
        "repaired_pages": int(pdf["repaired_pages"].map(len).sum()),
    }])


def assemble_conversations(extracted: DataFrame) -> DataFrame:
    """Per-conversation regroup with stable turn ordering. Uses grouped-map
    applyInPandas so the combine separator semantics are byte-exact (shared
    kernel with the golden generator); this is the pipeline's only shuffle."""
    return (
        extracted
        .select("conv_id", "turn_idx", "extracted_text", "n_pages",
                "problems", "repaired_pages")
        .groupBy("conv_id")
        .applyInPandas(_assemble_group, schema=ASSEMBLY_SCHEMA)
    )


def validation_report(extracted: DataFrame) -> DataFrame:
    """A3/A4: per-conversation validation rollup with the reference's cost
    model (pages_validated * 500 tokens * $0.01/1k) and priority-max overall
    status (problems_fixed > warnings > passed). Pure built-in aggregates."""
    per_turn_status = extracted.withColumn(
        "status",
        F.when(F.size("repaired_pages") > 0, F.lit("problems_fixed"))
        .when(F.size("problems") > 0, F.lit("warnings"))
        .otherwise(F.lit("passed")),
    )
    agg = per_turn_status.groupBy("conv_id").agg(
        F.count("*").alias("total_turns"),
        F.sum("n_pages").alias("total_pages"),
        F.sum(F.size("problems")).alias("total_problems"),
        F.sort_array(
            F.collect_list(F.when(F.size("problems") > 0, F.col("turn_idx")))
        ).alias("problem_turns"),
        F.sum((F.col("status") == "problems_fixed").cast("int")).alias("n_fixed"),
        F.sum((F.col("status") == "warnings").cast("int")).alias("n_warnings"),
        F.sum((F.col("status") == "passed").cast("int")).alias("n_passed"),
    )
    cost_per_page = VALIDATION_TOKENS_PER_PAGE * VALIDATION_COST_PER_1K_TOKENS / 1000.0
    return agg.select(
        "*",
        F.when(F.col("n_fixed") > 0, F.lit("problems_fixed"))
        .when(F.col("n_warnings") > 0, F.lit("warnings"))
        .otherwise(F.lit("passed"))
        .alias("overall_status"),
        (F.col("total_pages") * F.lit(cost_per_page)).alias("estimated_cost"),
    )


def run_pipeline(
    transcripts: DataFrame,
    salt_partitions: Optional[int] = None,
) -> DataFrame:
    """Full job: extraction map -> assembly. Returns the assembled
    conversations DataFrame (lazy; caller writes or collects)."""
    extracted = extract_transcripts(transcripts, salt_partitions)
    return assemble_conversations(extracted)
