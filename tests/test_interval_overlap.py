"""Interval-overlap self-join (joins.q_interval_overlap_join): crafted
intervals pin single emission across shared bins, the half-open boundary
(touching intervals do not overlap), zero-length drop, and the hot-bin cap."""
import datetime

from pdf_extractor_spark.operators.joins import (
    MAX_OVERLAP_BIN_EVENTS,
    q_interval_overlap_join,
)

BASE = datetime.datetime(2024, 1, 1)


def _write_events(spark, path, rows):
    # value*100 cents are read as SECONDS of duration by the operator
    spark.createDataFrame(
        [
            (eid, BASE + datetime.timedelta(seconds=t), uid, "click", v)
            for eid, uid, t, v in rows
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_overlap_semantics(spark, tmp_path):
    rows = [
        # user 1: e1 [0, 3600), e2 [1800, 5400) -> overlap 1800s;
        # e3 [3600, 3610) touches e1 (half-open: NO overlap), overlaps e2
        (1, 1, 0, 36.00),
        (2, 1, 1800, 36.00),
        (3, 1, 3600, 0.10),
        # zero-length interval inside e1/e2: dropped, overlaps nothing
        (4, 1, 2000, 0.0),
        # user 2: e5 [100, 7300) bins 0-2, e6 [7000, 7400) bins 1-2 —
        # two shared bins, later start 7000 -> only bin 1 claims: ONE row
        (5, 2, 100, 72.00),
        (6, 2, 7000, 4.00),
        # different users never pair even when times coincide
        (7, 3, 0, 36.00),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        (r["user_id"], r["id_lo"], r["id_hi"]): r["ov_us"]
        for r in q_interval_overlap_join(spark, str(tmp_path)).collect()
    }
    assert got == {
        (1, 1, 2): 1800 * 1_000_000,
        (1, 2, 3): 10 * 1_000_000,
        (2, 5, 6): 300 * 1_000_000,
    }


def test_hot_bin_cap_observed(spark, tmp_path):
    from pyspark.sql import Observation

    n = MAX_OVERLAP_BIN_EVENTS + 6
    rows = [(i, 9, 0, 1.00) for i in range(n)]  # all in bin 0, same user
    rows.append((1000, 8, 0, 1.00))  # lone event elsewhere: no pair
    _write_events(spark, tmp_path, rows)
    obs = Observation("cap")
    out = q_interval_overlap_join(spark, str(tmp_path), observation=obs)
    assert out.count() == 0  # hot bin dropped, singleton bin pairless
    assert obs.get["n_buckets_dropped"] == 1
    assert obs.get["n_ids_dropped"] == n
