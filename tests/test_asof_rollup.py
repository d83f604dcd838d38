"""As-of join semantics (inclusive ties, missing-build sentinel) and the
two-level rollup's partial-merge equality against a direct aggregation."""
import datetime

import pyspark.sql.functions as F

from pdf_extractor_spark.operators.aggregates import q_rollup_two_level
from pdf_extractor_spark.operators.windows import q_asof_join_events


def _events(spark, rows):
    # (event_id, user_id, event_type, value, ts_seconds)
    data = [
        (eid, uid, et, v, datetime.datetime(2024, 1, 1)
         + datetime.timedelta(seconds=s))
        for eid, uid, et, v, s in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, user_id long, event_type string, value double, "
        "ts timestamp_ntz",
    )


def test_asof_semantics(spark, tmp_path):
    rows = [
        (1, 7, "purchase", 10.0, 100),
        (2, 7, "error", 0.0, 100),     # same instant -> inclusive match
        (3, 7, "error", 0.0, 50),      # before any purchase -> sentinel
        (4, 7, "purchase", 20.0, 200),
        (5, 7, "error", 0.0, 250),     # picks ts=200, not ts=100
        (6, 8, "error", 0.0, 300),     # other user: no purchases at all
        (7, 7, "purchase", 30.0, 100), # tie at ts=100 -> max value wins
    ]
    sf = str(tmp_path)
    _events(spark, rows).write.parquet(f"{sf}/events.parquet")
    out = {
        r.event_id: (r.prev_purchase_val, r.gap_us)
        for r in q_asof_join_events(spark, sf).collect()
    }
    assert out[2] == (30.0, 0)             # inclusive + max-value tiebreak
    assert out[3] == (-1.0, -1)            # nothing at-or-before
    assert out[5] == (20.0, 50_000_000)    # latest prior, exact us gap
    assert out[6] == (-1.0, -1)            # user with no build rows


def test_rollup_merges_to_direct(spark):
    sf = "/root/testdata/sf0.001"
    two_level = q_rollup_two_level(spark, sf)
    ev = spark.read.parquet(f"{sf}/events.parquet").withColumn(
        "ep",
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', cast(ts as timestamp_ntz))"
        ),
    )
    cents = F.round(F.col("value") * 100).cast("long")
    direct = (
        ev.select(
            "event_type",
            F.expr("div(ep, 3600000000)").alias("hour_b"),
            cents.alias("c"),
        )
        .groupBy("event_type", F.expr("div(hour_b, 24)").alias("day_b"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("c").alias("sum_cents"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
            F.countDistinct("hour_b").alias("n_hours_active"),
        )
    )
    assert sorted(map(tuple, two_level.collect())) == sorted(
        map(tuple, direct.select(*two_level.columns).collect())
    )
    assert two_level.count() > 0


def test_incremental_merge_equals_two_level(spark):
    from pdf_extractor_spark.operators.aggregates import (
        q_rollup_incremental,
    )

    sf = "/root/testdata/sf0.001"
    inc = sorted(map(tuple, q_rollup_incremental(spark, sf).collect()))
    full = sorted(map(tuple, q_rollup_two_level(spark, sf).collect()))
    assert inc == full


def test_merge_partials_disjoint_and_overlapping(spark):
    from pdf_extractor_spark.operators.aggregates import merge_partials

    stored = spark.createDataFrame(
        [("a", 1, 2, 100, 10, 90), ("a", 2, 1, 50, 50, 50)],
        "event_type string, hour_b long, n long, s long, mn long, mx long",
    )
    batch = spark.createDataFrame(
        [("a", 2, 3, 60, 5, 55), ("b", 9, 1, 7, 7, 7)],
        "event_type string, hour_b long, n long, s long, mn long, mx long",
    )
    got = {
        (r.event_type, r.hour_b): (r.n, r.s, r.mn, r.mx)
        for r in merge_partials(stored, batch).collect()
    }
    assert got[("a", 1)] == (2, 100, 10, 90)    # untouched stored cell
    assert got[("a", 2)] == (4, 110, 5, 55)     # true upsert merge
    assert got[("b", 9)] == (1, 7, 7, 7)        # batch-only cell


def test_shipping_priority_shape(spark):
    from pdf_extractor_spark.operators.aggregates import (
        Q3_TOP_K,
        q_shipping_priority,
    )

    rows = q_shipping_priority(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= Q3_TOP_K
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    revs = [r.revenue_u4 for r in rows]
    assert revs == sorted(revs, reverse=True)
