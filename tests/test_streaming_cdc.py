"""Streaming CDC: the maintained state must equal last-writer-wins over
everything seen, the change log must classify each batch's writes, and
batch replays must be no-ops."""
from pdf_extractor_spark.streaming.cdc_stream import (
    apply_batch,
    cdc_sink,
    changes_log,
    state_from_store,
)

SCHEMA = "doc_id long, text string, seq long"


def test_stream_state_and_change_log(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    b1 = [(1, "one", 1), (2, "two", 2), (3, "three", 3), (4, "four", 4)]
    # batch 2: update 2, delete 3, re-upsert 4 UNCHANGED (no change row),
    # insert 5; doc 5 written twice in-batch — last writer (seq 9) wins
    b2 = [
        (2, "two-v2", 5),
        (3, None, 6),
        (4, "four", 7),
        (5, "five-early", 8),
        (5, "five", 9),
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        cdc_sink(stream, store)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = {r["doc_id"]: r["digest"] for r in state_from_store(spark, store).collect()}
    assert set(state) == {1, 2, 4, 5}

    log = changes_log(spark, store).collect()
    by_batch = {}
    for r in log:
        by_batch.setdefault(r["batch_id"], {})[r["doc_id"]] = r["change"]
    first, second = sorted(by_batch)
    assert by_batch[first] == {1: "insert", 2: "insert", 3: "insert", 4: "insert"}
    # no row for the unchanged re-upsert of 4; 5's two writes collapse
    assert by_batch[second] == {2: "update", 3: "delete", 5: "insert"}
    # the final state digest of 5 is the LAST write's
    import hashlib

    assert state[5] == hashlib.md5(b"five").hexdigest()


def test_replayed_batch_is_noop(spark, tmp_path):
    store = str(tmp_path / "store")
    b = spark.createDataFrame([(1, "a", 1), (2, "b", 2)], SCHEMA)
    apply_batch(b, 0, store)
    once_state = sorted(map(tuple, state_from_store(spark, store).collect()))
    once_log = sorted(map(tuple, changes_log(spark, store).collect()))
    apply_batch(b, 0, store)  # replay after commit
    assert sorted(map(tuple, state_from_store(spark, store).collect())) == once_state
    assert sorted(map(tuple, changes_log(spark, store).collect())) == once_log
    # a later batch deleting a key leaves the other intact
    apply_batch(
        spark.createDataFrame([(1, None, 3)], SCHEMA), 1, store
    )
    assert [r["doc_id"] for r in state_from_store(spark, store).collect()] == [2]
