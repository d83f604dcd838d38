"""The flagship extraction pipeline: transcripts -> per-turn extraction ->
per-conversation assembly + validation rollup.

Spark-first layout of the reference's EP2 lifecycle (SURVEY.md §3):
    read -> JVM-side payload routing (F2 CASE) -> Arrow kernel UDF for the
    ~5% payload-bearing turns ONLY -> per-turn result table
    -> window-ordered per-conversation assembly (byte-exact combine, pure
       expressions) -> validation report aggregate (A3/A4)

Scale notes (10^12 turns):
- **Python touches only payload rows.** The router predicate (pdf-prefix /
  html-head detection, mirroring kernels.segment.detect_payload_kind) runs
  JVM-side; plain turns' text is nulled out before the Arrow boundary, so the
  pandas UDF transfers ~nothing for the ~95% of rows whose extraction is the
  identity. Their result struct is synthesized with built-in expressions.
- **No pre-shuffle.** The per-turn map runs on scan-native partitions:
  parquet/Iceberg splits are byte-balanced (``files.maxPartitionBytes``),
  which defuses long-document skew better than a row-hash repartition —
  a row-count-balanced salt would co-locate many heavy payload rows. The
  optional ``salt_partitions`` hash-redistributes rows only for pathological
  source layouts (one file per giant conversation, no splittable format).
- The only shuffle is the final per-conversation regroup; AQE coalesces its
  output partitions and splits skewed groups' sort spills.
- Per-turn results can be written (and resumed) independently of assembly,
  so the expensive stage is checkpointed before the shuffle (plans.manifest).
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import (
    VALIDATION_COST_PER_1K_TOKENS,
    VALIDATION_TOKENS_PER_PAGE,
)
from ..functions.expressions import combine_sections_expr
from ..functions.udfs import extract_turn_udf
from ..kernels.segment import PDF_PAYLOAD_PREFIX

_EMPTY_SPANS = "array()"
_SPAN_OF_WHOLE = (
    "array(named_struct('offset', 0, 'length', length(text)))"
)


def _kind_expr() -> F.Column:
    """JVM replica of kernels.segment.detect_payload_kind — same precedence:
    layout prefix anywhere, else pdf prefix anywhere, else html open marker
    + closing tag anywhere (case-insensitive), else plain."""
    from ..kernels.layout import LAYOUT_PAYLOAD_PREFIX
    from ..kernels.segment import HTML_CLOSE, HTML_MARKERS

    low = F.lower("text")
    has_open = F.contains(low, F.lit(HTML_MARKERS[0]))
    for m in HTML_MARKERS[1:]:
        has_open = has_open | F.contains(low, F.lit(m))
    has_html = has_open & F.contains(low, F.lit(HTML_CLOSE))
    return (
        F.when(F.col("text").isNull() | (F.col("text") == ""), F.lit("plain"))
        .when(F.contains("text", F.lit(LAYOUT_PAYLOAD_PREFIX)), F.lit("layout"))
        .when(F.contains("text", F.lit(PDF_PAYLOAD_PREFIX)), F.lit("pdf"))
        .when(has_html, F.lit("html"))
        .otherwise(F.lit("plain"))
    )


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
        # Only for sources without byte-balanced splits (see module doc).
        df = df.repartition(salt_partitions, "conv_id", "turn_idx")

    empty_str_arr = F.array().cast("array<string>")
    empty_int_arr = F.array().cast("array<int>")
    empty_sections = F.array().cast(
        "array<struct<title:string,page:int,end_page:int>>"
    )

    df = df.withColumn("kind", _kind_expr())
    is_plain = F.col("kind") == "plain"
    # Null input for plain rows: the Arrow transfer carries only payload rows'
    # text; the kernel returns a dummy row for None in ~no time.
    x = extract_turn_udf(F.when(is_plain, F.lit(None)).otherwise(F.col("text")))

    has_text = F.col("text").isNotNull() & (F.col("text") != "")
    result = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "kind",
        F.when(is_plain, F.when(has_text, 1).otherwise(0))
        .otherwise(x["n_pages"]).alias("n_pages"),
        F.when(is_plain, F.coalesce(F.col("text"), F.lit("")))
        .otherwise(x["extracted_text"]).alias("extracted_text"),
        F.when(
            is_plain,
            F.when(has_text, F.expr(_SPAN_OF_WHOLE))
            .otherwise(F.expr(_EMPTY_SPANS))
            .cast("array<struct<offset:int,length:int>>"),
        ).otherwise(x["spans"]).alias("spans"),
        F.when(is_plain, empty_str_arr).otherwise(x["problems"]).alias("problems"),
        F.when(is_plain, empty_sections).otherwise(x["sections"]).alias("sections"),
        F.when(is_plain, empty_int_arr)
        .otherwise(x["repaired_pages"]).alias("repaired_pages"),
        F.when(is_plain, F.lit(True)).otherwise(x["valid"]).alias("valid"),
    )
    return result.withColumn("n_chars", F.length("extracted_text"))


def assemble_conversations(
    extracted: DataFrame,
    bucket_turns: Optional[int] = None,
) -> DataFrame:
    """Per-conversation regroup with stable turn ordering — pure built-ins:
    ``sort_array(collect_list(struct(turn_idx, ...)))`` then the A1 combine
    expression (byte-parity with kernels.segment.combine_markdown_sections is
    pinned by tests/test_pipeline_golden.py).

    Default (``bucket_turns=None``): ONE shuffle keyed on conv_id — right
    when conversation length is bounded (transcript corpora cap out around
    10^3-10^4 turns), since each text byte crosses the wire once and AQE
    splits skewed sort spills.

    ``bucket_turns=N``: two-level combine for UNBOUNDED conversation length —
    a first shuffle on (conv_id, turn_idx div N) builds partial ordered
    concats (per-task collect_list state bounded by N turns), a second merges
    the per-bucket partials. A single 10^6-turn mega-conversation is then
    ~10^6/N bucket rows merged in one cheap final group instead of one
    collect_list task holding every turn. Byte-equality of the two paths is
    pinned by tests/test_skew.py (the strip->drop-empties->join combine is
    associative over pre-stripped partials; the 1-turn as-is special case is
    preserved via the bucket's raw first element)."""
    base = extracted.select(
        "conv_id", "turn_idx", "extracted_text", "n_pages",
        (F.size("problems") > 0).cast("int").alias("has_problem"),
        F.size("repaired_pages").alias("n_repaired"),
    )
    report_cols = [
        F.sum("n_pages").alias("total_pages"),
        F.sum("has_problem").cast("int").alias("problem_turns"),
        F.sum("n_repaired").cast("int").alias("repaired_pages"),
    ]

    if bucket_turns is None:
        ordered = F.sort_array(
            F.collect_list(F.struct("turn_idx", "extracted_text"))
        )
        agg = base.groupBy("conv_id").agg(
            F.count("*").cast("int").alias("n_turns"),
            ordered.alias("ordered"),
            *report_cols,
        )
        texts = F.transform(F.col("ordered"), lambda s: s["extracted_text"])
        return agg.select(
            "conv_id",
            "n_turns",
            combine_sections_expr(texts).alias("conversation_markdown"),
            "total_pages",
            "problem_turns",
            "repaired_pages",
        )

    from ..config import MARKDOWN_SECTION_SEPARATOR
    from ..functions.expressions import PY_STRIP_CLASS

    strip = lambda s: F.regexp_replace(  # noqa: E731
        s, f"^{PY_STRIP_CLASS}+|{PY_STRIP_CLASS}+$", ""
    )
    ordered = F.sort_array(
        F.collect_list(F.struct("turn_idx", "extracted_text"))
    )
    texts = F.transform(ordered, lambda s: s["extracted_text"])
    partials = (
        base.withColumn("bucket", (F.col("turn_idx") / bucket_turns).cast("long"))
        .groupBy("conv_id", "bucket")
        .agg(
            F.count("*").cast("int").alias("b_turns"),
            # partial combine: strip + drop empties + join (NO singleton
            # special case at bucket level — that applies to the whole conv)
            F.array_join(
                F.filter(F.transform(texts, strip), lambda s: s != ""),
                MARKDOWN_SECTION_SEPARATOR,
            ).alias("partial_md"),
            # raw first element, for the 1-turn-conversation as-is semantics
            F.element_at(texts, 1).alias("first_raw"),
            *report_cols,
        )
    )
    parts = F.sort_array(
        F.collect_list(F.struct("bucket", "partial_md", "first_raw"))
    )
    agg = partials.groupBy("conv_id").agg(
        F.sum("b_turns").cast("int").alias("n_turns"),
        parts.alias("parts"),
        F.sum("total_pages").alias("total_pages"),
        F.sum("problem_turns").cast("int").alias("problem_turns"),
        F.sum("repaired_pages").cast("int").alias("repaired_pages"),
    )
    merged_md = F.when(
        F.col("n_turns") == 1, F.element_at("parts", 1)["first_raw"]
    ).otherwise(
        F.array_join(
            F.filter(
                F.transform(F.col("parts"), lambda p: p["partial_md"]),
                lambda s: s != "",
            ),
            MARKDOWN_SECTION_SEPARATOR,
        )
    )
    return agg.select(
        "conv_id",
        "n_turns",
        merged_md.alias("conversation_markdown"),
        "total_pages",
        "problem_turns",
        "repaired_pages",
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
    # A4 breakdown map (reference default_handler.py:199-238): status -> count,
    # only statuses actually seen — mirrors the reference's dict semantics.
    breakdown = F.map_from_entries(
        F.filter(
            F.array(
                F.struct(F.lit("problems_fixed").alias("k"), F.col("n_fixed").alias("v")),
                F.struct(F.lit("warnings").alias("k"), F.col("n_warnings").alias("v")),
                F.struct(F.lit("passed").alias("k"), F.col("n_passed").alias("v")),
            ),
            lambda s: s["v"] > 0,
        )
    )
    return agg.select(
        "*",
        F.when(F.col("n_fixed") > 0, F.lit("problems_fixed"))
        .when(F.col("n_warnings") > 0, F.lit("warnings"))
        .otherwise(F.lit("passed"))
        .alias("overall_status"),
        breakdown.alias("status_breakdown"),
        (F.col("total_pages") * F.lit(cost_per_page)).alias("estimated_cost"),
    )


def tool_usage(transcripts: DataFrame) -> DataFrame:
    """Per-conversation tool-call rollup over the raw transcript columns the
    input contract carries (`role`/`tool`/`ts`): tool-turn count, the
    deterministic sorted set of tools used, and the conversation's
    event-time span. One keyed aggregation; collect_list drops the null
    tool of non-tool turns for free."""
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col("role") == "tool").cast("int")).alias("n_tool_turns"),
        F.array_join(
            F.array_distinct(F.sort_array(F.collect_list("tool"))), ","
        ).alias("tools_used"),
        # difference of fractional epoch seconds, truncated ONCE — per-
        # endpoint unix_timestamp() truncation would be off by a second on
        # sub-second timestamps
        (F.max("ts").cast("double") - F.min("ts").cast("double"))
        .cast("long")
        .alias("span_seconds"),
    )


def run_pipeline(
    transcripts: DataFrame,
    salt_partitions: Optional[int] = None,
) -> DataFrame:
    """Full job: extraction map -> assembly. Returns the assembled
    conversations DataFrame (lazy; caller writes or collects)."""
    extracted = extract_transcripts(transcripts, salt_partitions)
    return assemble_conversations(extracted)
