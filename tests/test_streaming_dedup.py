"""Streaming stateful LSH dedup: pairs must match the batch LSH candidate
set on the same corpus, and bucket state must work across micro-batches
(a duplicate arriving in a LATER file still pairs with its original)."""
import os

import pyspark.sql.functions as F
import pytest

from pdf_extractor_spark.operators.dedup import minhash_lsh_pairs
from pdf_extractor_spark.streaming.stateful_dedup import (
    banded_buckets,
    dedup_pairs_stream,
)

DOC_SCHEMA = "doc_id long, text string"


def _corpus(spark):
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, f"unique{i} filler{i} words{i} here{i} now{i}") for i in range(20)]
    rows += [(100, dup), (200, dup), (300, dup + " trailing")]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_stream_matches_batch_pairs(spark, tmp_path):
    docs = _corpus(spark)
    src = str(tmp_path / "docs")
    # duplicates spread across files -> pairing must cross micro-batches
    docs.where("doc_id < 150").coalesce(1).write.mode("overwrite").parquet(src)
    docs.where("doc_id >= 150").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        dedup_pairs_stream(stream)
        .writeStream.format("memory")
        .queryName("stream_pairs")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM stream_pairs").collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    assert got == want
    assert (100, 200) in got  # same-file pair
    assert (100, 300) in got or (200, 300) in got  # cross-batch pair


def test_row_local_signatures_match_batch(spark):
    """array_min-over-transform signatures == explode+groupBy-min batch
    signatures, value for value."""
    from pdf_extractor_spark.operators.dedup import N_MINHASH, _minhash_frame

    docs = _corpus(spark)
    stream_side = {
        (r["band"], r["h"], r["doc_id"])
        for r in banded_buckets(docs).collect()
    }
    batch = _minhash_frame(docs).collect()
    batch_side = {
        (i, r[f"mh{i}"], r["doc_id"])
        for r in batch
        for i in range(N_MINHASH)
    }
    assert stream_side == batch_side
