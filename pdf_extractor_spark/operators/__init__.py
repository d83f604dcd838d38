"""DataFrame-level operators, each mirroring a reference capability
(SURVEY.md §2) or a training-data-pipeline extension (dedup, ANN, text
analysis, multimodal). Every oracle-checkable operator module exposes:

- query functions ``(spark, sf_dir) -> DataFrame`` over the driver parquet
  tables, and
- an ``ORACLES`` dict of equivalent DuckDB SQL with identical column names,
  consumed by ``__spark_entry__.py``.
"""

from . import (  # noqa: F401
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


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread_for_cpu_map(df):
    """Repartition a frame feeding a compute-dominated per-row kernel, but
    ONLY when the scan yields fewer splits than cores. Byte-balanced scan
    splits assume scan-like cost per byte; a kernel costing orders of
    magnitude more CPU per byte (interpreted higher-order-function maps:
    CDC hashing, trigram explode) turns a single small file into one
    multi-minute task. At corpus scale the scan's own splits parallelize
    fine and this is a no-op — no shuffle paid. The explicit numPartitions
    repartition survives AQE coalescing."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
