"""Streaming CUSUM twin: alarms read from the maintained rollup store
must match the batch fold's semantics — a real level shift fed through
the foreachBatch merge trips exactly the shifted series."""
import datetime

from pdf_extractor_spark.streaming.cusum_stream import cusum_from_store
from pdf_extractor_spark.streaming.rollup_stream import merge_batch

EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double"
)
BASE = datetime.datetime(2024, 1, 1)


def _batch(spark, eid0, days, error_per_day):
    # 6 click/day always; error_per_day errors/day over the given days
    rows, eid = [], eid0
    for day in days:
        for k in range(6):
            rows.append(
                (eid, BASE + datetime.timedelta(days=day, seconds=eid),
                 1, "click", 1.0)
            )
            eid += 1
        for k in range(error_per_day):
            rows.append(
                (eid, BASE + datetime.timedelta(days=day, seconds=eid),
                 1, "error", 1.0)
            )
            eid += 1
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_empty_store_yields_empty_frame(spark, tmp_path):
    out = cusum_from_store(spark, str(tmp_path / "nostore"))
    assert out.count() == 0


def test_shift_fed_through_merge_alarms(spark, tmp_path):
    store = str(tmp_path / "store")
    # batch 0: 18 stable days (6 errors/day); no alarm anywhere yet
    merge_batch(_batch(spark, 0, range(0, 18), 6), 0, store)
    pre = {r["event_type"]: r for r in cusum_from_store(spark, store).collect()}
    assert pre["error"]["alarmed"] == 0 and pre["click"]["alarmed"] == 0

    # batch 1: a REAL level shift — 46 errors/day for days 18..25
    merge_batch(_batch(spark, 10_000, range(18, 26), 46), 1, store)
    post = {r["event_type"]: r for r in cusum_from_store(spark, store).collect()}
    assert post["click"]["alarmed"] == 0
    err = post["error"]
    assert err["alarmed"] == 1
    assert err["base"] == 6
    # S jumps 40/day (allowance 6 div 20 = 0); threshold base = 6 is
    # crossed on the first shifted day
    assert err["max_cusum"] == 8 * 40
    # replay of batch 1 must not double-count (store is versioned)
    merge_batch(_batch(spark, 10_000, range(18, 26), 46), 1, store)
    again = {r["event_type"]: r for r in cusum_from_store(spark, store).collect()}
    assert again["error"]["max_cusum"] == 8 * 40
