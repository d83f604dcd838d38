"""Crafted-input semantics tests for the round-3 monitoring/graph ops:
CUSUM alarm placement (the injected-shift contract), lateness bucketing of
a crafted inversion (event ids chosen OFF the synthetic delay schedule),
and the k-core cascade on a minimal core+tendril graph."""
import datetime

from pdf_extractor_spark.operators.aggregates import (
    CUSUM_SHIFT_DAY,
    q_cusum_changepoint,
)
from pdf_extractor_spark.operators.graph import KCORE_CORE, q_kcore_peel
from pdf_extractor_spark.operators.windows import q_lateness_audit

BASE = datetime.datetime(2024, 1, 1, 12, 0, 0)
EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double"
)


def test_cusum_alarm_on_injected_shift(spark, tmp_path):
    # 6 events/day for 26 days for both types. The operator injects +40
    # into the 'error' series from CUSUM_SHIFT_DAY: baseline 6 (first
    # week), allowance 6 div 20 = 0, threshold h = 6 -> the first shifted
    # day pushes S to 40 > 6: alarm exactly AT the shift day. 'click'
    # stays flat: S = 0 forever, max_cusum 0, sentinel alarm_day -1.
    rows = []
    eid = 0
    for day in range(26):
        for k in range(6):
            for et in ("click", "error"):
                rows.append(
                    (eid, BASE + datetime.timedelta(days=day, seconds=eid),
                     1, et, 1.0)
                )
                eid += 1
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    out = {r["event_type"]: r
           for r in q_cusum_changepoint(spark, str(tmp_path)).collect()}
    assert out["click"]["max_cusum"] == 0
    assert out["click"]["alarm_day"] == -1 and out["click"]["alarmed"] == 0
    assert out["error"]["base"] == 6
    assert out["error"]["alarm_day"] == CUSUM_SHIFT_DAY
    assert out["error"]["alarmed"] == 1
    assert out["error"]["max_cusum"] == (26 - CUSUM_SHIFT_DAY) * 40


def test_lateness_buckets_crafted_inversion(spark, tmp_path):
    # event ids 1..4 sit OFF the synthetic delay schedule (not % 7 == 0,
    # % 31 == 0, or % 101 == 0), so only the crafted disorder counts:
    # arrival order 1,2,3,4 with event times 100s, 200s, 150s (50s late ->
    # le_1m), 200s (exactly at the running max -> lateness 0, on time).
    rows = [
        (1, BASE + datetime.timedelta(seconds=100), 1, "view", 1.0),
        (2, BASE + datetime.timedelta(seconds=200), 1, "view", 1.0),
        (3, BASE + datetime.timedelta(seconds=150), 1, "view", 1.0),
        (4, BASE + datetime.timedelta(seconds=200), 1, "view", 1.0),
    ]
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    out = {r["label"]: r for r in q_lateness_audit(spark, str(tmp_path)).collect()}
    assert out["on_time"]["cnt"] == 3
    assert out["le_1m"]["cnt"] == 1
    assert out["le_1m"]["max_late_us"] == 50_000_000
    assert set(out) == {"on_time", "le_1m"}


def test_kcore_cascade_minimal(spark, tmp_path):
    # 60 docs: a KCORE_CORE-wide stride-wired core (degree ~7) plus 10
    # tendril tips (50..59 attach to 0..9, degree 1). Round 1 peels the
    # tips; rounds 2+ are converged (core degree never drops below 2).
    n = KCORE_CORE + 10
    spark.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["round"]: r for r in q_kcore_peel(spark, str(tmp_path)).collect()}
    assert out[1]["n_active"] == KCORE_CORE
    core_edges = out[1]["n_edges"]
    for r in range(2, 7):
        assert out[r]["n_active"] == KCORE_CORE
        assert out[r]["n_edges"] == core_edges
