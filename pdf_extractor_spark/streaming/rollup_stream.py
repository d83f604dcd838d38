"""Streaming continuous aggregate: the foreachBatch composition of
``operators.aggregates.merge_partials`` — each micro-batch's hourly
partials MERGE-upsert into a persisted partial table, so at any moment the
daily rollup read from the store equals a one-shot rollup of everything
seen so far (the invariant ``q_rollup_incremental``'s oracle proves for
one increment; the stream applies it per batch, forever).

This is the lakehouse "materialized view maintenance" loop: per batch
O(batch) aggregation + a merge keyed on the touched (event_type, hour)
cells — history is never recomputed. Late/out-of-order events are the
NORMAL case here (a cell absorbs updates whenever its hours resurface),
which is exactly why rollup state must be mergeable rather than final.

Exactly-once: the store write carries the batch_id; a replayed batch
(same id) sees the store ALREADY advanced and skips — the two-phase
batch-keyed commit from packing_stream, applied to aggregate state. The
full store rewrite per batch is the local-parquet stand-in for a MERGE
INTO on a transactional table (Iceberg/Delta); the cell-keyed merge plan
is identical either way.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import _hourly_partials, _with_ep, merge_partials

_SCHEMA = (
    "event_type string, hour_b long, n long, s long, mn long, mx long, "
    "batch_id long"
)


def _read_store(spark: SparkSession, path: str):
    """(partials_df_or_None, last_batch_id)."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None, -1
    df = spark.read.parquet(path)
    last = df.agg(F.max("batch_id")).first()[0]
    return df.drop("batch_id"), int(last if last is not None else -1)


def merge_batch(batch: DataFrame, batch_id: int, store_path: str) -> None:
    """foreachBatch body: aggregate this batch to hourly partials, merge
    into the stored cells, rewrite the store stamped with batch_id."""
    spark = batch.sparkSession
    stored, last_id = _read_store(spark, store_path)
    if batch_id <= last_id:
        return  # replay after commit — already merged
    part = _hourly_partials(_with_ep(batch))
    merged = part if stored is None else merge_partials(stored, part)
    out = merged.withColumn("batch_id", F.lit(batch_id))
    # snapshot-read then overwrite: localCheckpoint pins the read before
    # the write truncates the directory under it
    out.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        store_path
    )


def rollup_sink(stream: DataFrame, store_path: str):
    """writeStream wiring for an events-shaped stream (event_id, ts,
    user_id, event_type, value); caller starts with its checkpoint dir."""

    def _fn(batch: DataFrame, batch_id: int) -> None:
        merge_batch(
            batch.select("event_id", "ts", "event_type", "value"),
            batch_id,
            store_path,
        )

    return stream.writeStream.foreachBatch(_fn)


def daily_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """The read side: daily rollup from the maintained partials — the
    same second-level aggregation as q_rollup_two_level."""
    return (
        spark.read.parquet(store_path)
        .groupBy("event_type", F.expr("div(hour_b, 24)").alias("day_b"))
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").alias("sum_cents"),
            F.min("mn").alias("min_cents"),
            F.max("mx").alias("max_cents"),
            F.count("*").alias("n_hours_active"),
        )
    )
