"""Stateful streaming context packing: per-conversation state must survive
micro-batches (maxFilesPerTrigger=1), re-packing must stay exact under
split/out-of-order arrival, and the final snapshot per conversation must be
value-identical to the batch q_conv_window_pack."""
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_extractor_spark.functions.expressions import token_count_expr
from pdf_extractor_spark.operators.packing import (
    CONV_TURNS,
    q_conv_window_pack,
)
from pdf_extractor_spark.streaming.conv_pack_stream import conv_pack_stream

SF_DIR = "/root/testdata/sf0.001"
TURNS_SCHEMA = "conv long, turn_idx int, n_tokens long"


@pytest.fixture(scope="module")
def turns_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("convpack") / "turns")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    turns = docs.select(
        F.expr(f"doc_id DIV {CONV_TURNS}").alias("conv"),
        (F.col("doc_id") % CONV_TURNS).cast("int").alias("turn_idx"),
        token_count_expr(F.col("text")).cast("long").alias("n_tokens"),
    )
    # shuffle the rows across 5 files so conversations SPLIT across
    # micro-batches and turns arrive out of order within each conv
    turns.orderBy(F.md5(F.concat_ws(":", "conv", "turn_idx"))).coalesce(
        1
    ).repartition(5).write.parquet(path)
    return path


def test_streaming_pack_matches_batch(spark, turns_dir, tmp_path):
    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(turns_dir)
    )
    q = (
        conv_pack_stream(stream)
        .writeStream.format("memory")
        .queryName("conv_pack_snapshots")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    snaps = spark.sql("SELECT * FROM conv_pack_snapshots")
    # final snapshot per conv = rows carrying that conv's max snap_n_turns
    final = (
        snaps.withColumn(
            "max_n", F.max("snap_n_turns").over(Window.partitionBy("conv"))
        )
        .where(F.col("snap_n_turns") == F.col("max_n"))
        .select("conv", "turn_idx", "n_tokens", "truncated",
                "win_id", "win_offset")
        .distinct()
    )
    got = sorted(tuple(r) for r in final.collect())
    want = sorted(tuple(r) for r in q_conv_window_pack(spark, SF_DIR).collect())
    assert len(got) == len(want) > 0
    assert got == want
