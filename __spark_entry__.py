"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship extraction pipeline on sf0.001
inputs; ``queries()`` exposes every oracle-checkable operator from
SURVEY.md §2 plus the training-data extensions (dedup / ANN / text analysis /
multimodal); ``oracle_sql()`` carries the equivalent DuckDB SQL with matching
column names/aliases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark.operators import (
    agent,
    aggregates,
    ann_index,
    bpe,
    chunking,
    classifier,
    dedup,
    graph,
    joins,
    multimodal,
    olap,
    packing,
    pq,
    retrieval,
    sequences,
    setjoin,
    similarity_search,
    sketches,
    tables_md,
    text_analysis,
    text_ops,
    warehouse,
    web,
    windows,
    zorder,
)

_MODULES = [
    text_ops, windows, aggregates, dedup, graph, similarity_search,
    text_analysis, multimodal, joins, tables_md, chunking, packing, bpe,
    web, pq, sketches, retrieval, classifier, zorder, setjoin, warehouse,
    olap, sequences, agent, ann_index,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize a deterministic transcript corpus (the driver
    parquet tables carry no transcripts), run the full extraction pipeline,
    and join per-conversation assemblies with the sf0.001 documents scan so
    the driver exercises both the pipeline and the parquet path."""
    from pdf_extractor_spark.plans.pipeline import (
        extract_transcripts,
        validation_report,
    )
    from pdf_extractor_spark.sources.transcripts import transcripts_df

    transcripts = transcripts_df(spark, n_convs=24, seed=42)
    extracted = extract_transcripts(transcripts)
    report = validation_report(extracted)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc_stats = docs.agg(F.count("*").alias("n_docs"))
    return report.crossJoin(F.broadcast(doc_stats)).orderBy("conv_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
