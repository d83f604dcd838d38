"""Arrow-batched pandas UDFs wrapping the pure kernels.

UDFs are the slow path: everything expressible with built-in functions lives
in ``expressions.py`` instead. What remains here is genuinely non-SQL logic:
the extraction kernel (payload decode + segmentation + detect/repair +
byte-exact assembly), the fused detector suite, EU/US number disambiguation,
number-frequency similarity, and SimHash. All are Series->Series (one Arrow
round trip per batch, no per-row Python at the Spark API level).
"""
from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernels.detectors import detect_problems
from ..kernels.numbers import extract_numbers, parse_number
from ..kernels.segment import extract_turn
from ..kernels.similarity import calculate_similarity
from ..kernels.textstats import detect_language, quality_score, simhash64

SPAN_TYPE = StructType([
    StructField("offset", IntegerType()),
    StructField("length", IntegerType()),
])

SECTION_TYPE = StructType([
    StructField("title", StringType()),
    StructField("page", IntegerType()),
    StructField("end_page", IntegerType()),
])

EXTRACTION_TYPE = StructType([
    StructField("kind", StringType()),
    StructField("n_pages", IntegerType()),
    StructField("extracted_text", StringType()),
    StructField("spans", ArrayType(SPAN_TYPE)),
    StructField("problems", ArrayType(StringType())),
    StructField("sections", ArrayType(SECTION_TYPE)),
    StructField("repaired_pages", ArrayType(IntegerType())),
    StructField("valid", BooleanType()),
])


def _turn_to_row(text: Optional[str]) -> dict:
    r = extract_turn(text)
    return {
        "kind": r["kind"],
        "n_pages": r["n_pages"],
        "extracted_text": r["extracted_text"],
        "spans": [{"offset": o, "length": l} for o, l in r["spans"]],
        "problems": r["problems"],
        "sections": [
            {"title": s["title"], "page": s["page"], "end_page": s["end_page"]}
            for s in r["sections"]
        ],
        "repaired_pages": r["repaired_pages"],
        "valid": r["valid"],
    }


_PLAIN_DUMMY = {
    "kind": "plain", "n_pages": 0, "extracted_text": "", "spans": [],
    "problems": [], "sections": [], "repaired_pages": [], "valid": True,
}


@pandas_udf(EXTRACTION_TYPE)
def extract_turn_udf(text: pd.Series) -> pd.DataFrame:
    """The flagship extraction kernel, one Arrow batch at a time. Null inputs
    (plain rows routed JVM-side, plans/pipeline.py) share one dummy dict —
    the kernel never runs for them and no per-row objects are built."""
    return pd.DataFrame([
        _PLAIN_DUMMY if t is None else _turn_to_row(t) for t in text
    ])


@pandas_udf(ArrayType(StringType()))
def detect_problems_udf(content: pd.Series) -> pd.Series:
    """Fused 14-pattern detector suite with the default-enabled set."""
    return content.map(lambda c: detect_problems(c or ""))


def detect_problems_udf_for(enabled: List[str]):
    """Detector UDF bound to an explicit enabled set (constant-folded into
    the closure, mirroring the reference's enabled-patterns pruning)."""
    @pandas_udf(ArrayType(StringType()))
    def _udf(content: pd.Series) -> pd.Series:
        return content.map(lambda c: detect_problems(c or "", enabled))
    return _udf


@pandas_udf(ArrayType(StringType()))
def extract_numbers_udf(text: pd.Series) -> pd.Series:
    """EU/US-disambiguating number extraction (X2)."""
    return text.map(lambda t: extract_numbers(t or ""))


@pandas_udf(DoubleType())
def parse_number_udf(text: pd.Series) -> pd.Series:
    """Single formatted-money parser (X3); None for unparseable."""
    return text.map(parse_number)


@pandas_udf(StringType())
def fix_bidi_udf(text: pd.Series) -> pd.Series:
    """X4: RTL visual reordering of cell text (mini-UBA kernel)."""
    from ..kernels.normalize import fix_bidi_text

    return text.map(lambda t: fix_bidi_text(t or ""))


CASCADE_TYPE = StructType([
    StructField("method", StringType()),
    StructField("n_rows", IntegerType()),
    StructField("n_cols", IntegerType()),
    StructField("last_cell", StringType()),
])


@pandas_udf(CASCADE_TYPE)
def table_cascade_udf(text: pd.Series) -> pd.DataFrame:
    """S5: lattice/stream flavor cascade summary per document."""
    from ..kernels.table_scan import extract_tables_cascade

    def f(t):
        r = extract_tables_cascade(t or "")
        rows = r["rows"]
        return {
            "method": r["method"],
            "n_rows": len(rows),
            "n_cols": len(rows[0]) if rows else 0,
            "last_cell": rows[-1][-1] if rows else "",
        }

    return pd.DataFrame([f(t) for t in text])


@pandas_udf(DoubleType())
def similarity_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Full similarity dispatcher (quick Jaccard early-exit + configured
    method)."""
    return pd.Series([
        calculate_similarity(x or "", y or "") for x, y in zip(a, b)
    ])


@pandas_udf(StringType())
def detect_language_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: detect_language(t or ""))


@pandas_udf(DoubleType())
def quality_score_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: quality_score(t or ""))


@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: simhash64(t or ""))


@pandas_udf(StringType())
def repair_image_aware_udf(body: pd.Series) -> pd.Series:
    """The image-specific repair dialect (kernels/segment.py
    repair_page_image_aware): image-ref lines byte-exact, prose segments
    through the plain repair kernel, blank-line image separation."""
    from ..kernels.segment import repair_page_image_aware

    return body.map(lambda t: repair_page_image_aware(t or ""))


def _first_table_rows(md: str) -> List[List[str]]:
    from ..kernels.markdown_tables import parse_markdown_tables

    tables = parse_markdown_tables(md or "")
    return tables[0]["rows"] if tables else []


@pandas_udf(ArrayType(ArrayType(StringType())))
def parse_md_rows_udf(md: pd.Series) -> pd.Series:
    """X9: first markdown table's data rows (header/separator dropped)."""
    return md.map(_first_table_rows)
