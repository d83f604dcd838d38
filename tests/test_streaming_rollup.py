"""Streaming continuous aggregate: the maintained partial store must equal
a one-shot rollup of everything seen, and batch replays must not
double-count."""
import datetime

from pdf_extractor_spark.operators.aggregates import q_rollup_two_level
from pdf_extractor_spark.streaming.rollup_stream import (
    daily_from_store,
    merge_batch,
    rollup_sink,
)

EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double"
)


def _events(spark, lo, hi):
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(hours=i % 70, seconds=i),
            i % 9,
            ["click", "purchase"][i % 2],
            float(i % 40) + 0.25,
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, EV_SCHEMA)


def _daily_direct(spark, df, tmp):
    path = f"{tmp}/oneshot/events.parquet"
    df.write.mode("overwrite").parquet(path)
    return q_rollup_two_level(spark, f"{tmp}/oneshot")


def test_stream_store_equals_one_shot(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    _events(spark, 0, 120).coalesce(1).write.mode("overwrite").parquet(src)
    # second file revisits EARLIER hours: the out-of-order upsert case
    _events(spark, 120, 200).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        rollup_sink(stream, store)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, daily_from_store(spark, store).collect()))
    want = sorted(
        map(
            tuple,
            _daily_direct(
                spark, _events(spark, 0, 200), str(tmp_path)
            ).collect(),
        )
    )
    assert got == want


def test_replayed_batch_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    merge_batch(_events(spark, 0, 50), 0, store)
    once = sorted(map(tuple, daily_from_store(spark, store).collect()))
    merge_batch(_events(spark, 0, 50), 0, store)  # replay: must skip
    again = sorted(map(tuple, daily_from_store(spark, store).collect()))
    assert once == again
    merge_batch(_events(spark, 50, 90), 1, store)
    final = sorted(map(tuple, daily_from_store(spark, store).collect()))
    want = sorted(
        map(
            tuple,
            _daily_direct(
                spark, _events(spark, 0, 90), str(tmp_path)
            ).collect(),
        )
    )
    assert final == want


def test_crashed_snapshot_is_invisible_and_recovered(spark, tmp_path):
    """A snapshot write that died mid-flight (v=1 exists, no _SUCCESS) must
    not shadow the committed v=0 store; replaying the batch publishes v=1
    over the debris and prunes v=0 — history is never destroyed by an
    in-place rewrite."""
    import os

    from pdf_extractor_spark.plans import fsio

    store = str(tmp_path / "store_crash")
    merge_batch(_events(spark, 0, 50), 0, store)
    served = sorted(map(tuple, daily_from_store(spark, store).collect()))

    # debris of a crashed batch-1 snapshot write
    os.makedirs(os.path.join(store, "v=1", "_temporary"))
    assert fsio.committed_versions(spark, store, "v=") == [0]
    assert (
        sorted(map(tuple, daily_from_store(spark, store).collect())) == served
    )

    merge_batch(_events(spark, 50, 90), 1, store)  # replay over the debris
    assert fsio.committed_versions(spark, store, "v=") == [1]
    want = sorted(
        map(
            tuple,
            _daily_direct(
                spark, _events(spark, 0, 90), str(tmp_path)
            ).collect(),
        )
    )
    assert sorted(map(tuple, daily_from_store(spark, store).collect())) == want


def test_flat_legacy_store_fails_loudly(spark, tmp_path):
    """A pre-versioning store (part files at the root) must raise, not be
    silently read as empty (which would discard the accumulated state and
    restart batch dedup from zero)."""
    import pytest

    from pdf_extractor_spark.plans import fsio

    store = str(tmp_path / "flat_store")
    spark.createDataFrame([(1,)], "x long").write.parquet(store)
    with pytest.raises(ValueError, match="flat"):
        fsio.committed_versions(spark, store, "v=")
