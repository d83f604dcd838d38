"""Custom Python Data Source (sources/synthlog.py): partition planning,
deterministic replay, pushed-vs-residual filter equivalence, uneven splits."""
import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.sources.synthlog import LEVELS, register


@pytest.fixture()
def synthlog(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    return spark


def _read(spark, rows, parts):
    return (
        spark.read.format("synthlog")
        .option("rows", str(rows))
        .option("partitions", str(parts))
        .load()
    )


def test_partition_planning_and_determinism(synthlog):
    df = _read(synthlog, 1003, 4)  # uneven: ceil(1003/4)=251 -> last=250
    assert df.count() == 1003
    per_part = {
        r["part"]: r["n"]
        for r in df.groupBy("part").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_part == {0: 251, 1: 251, 2: 251, 3: 250}
    # the task-retry contract: two reads are byte-identical
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in _read(synthlog, 1003, 4).collect())
    assert a == b


def test_pushdown_equals_residual_semantics(synthlog):
    df = _read(synthlog, 4000, 8)
    # pushed path: EqualTo absorbed by the reader
    pushed = df.where(F.col("level") == "warn")
    # unpushable formulation of the same predicate (expression on level):
    # the reader yields everything, Spark filters
    residual = df.where(F.upper("level") == "WARN")
    assert sorted(map(tuple, pushed.collect())) == sorted(
        map(tuple, residual.collect())
    )
    assert pushed.count() == 1000
    # content formula is the documented one
    row = pushed.where(F.col("row_id") == 2).collect()[0]
    assert row["level"] == LEVELS[2] == "warn"
    assert row["n_bytes"] == (2 * 2654435761) % 1000
