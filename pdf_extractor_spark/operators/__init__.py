"""DataFrame-level operators, each mirroring a reference capability
(SURVEY.md §2) or a training-data-pipeline extension (dedup, ANN, text
analysis, multimodal). Every oracle-checkable operator module exposes:

- query functions ``(spark, sf_dir) -> DataFrame`` over the driver parquet
  tables, and
- an ``ORACLES`` dict of equivalent DuckDB SQL with identical column names,
  consumed by ``__spark_entry__.py``.
"""

from . import (  # noqa: F401
    aggregates,
    chunking,
    dedup,
    graph,
    joins,
    multimodal,
    packing,
    similarity_search,
    tables_md,
    text_analysis,
    text_ops,
    windows,
)


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
