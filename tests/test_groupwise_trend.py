"""Group-wise OLS trend (aggregates.q_groupwise_trend): crafted event
frames pin the closed-form slope, negative-slope truncation toward zero
(the Spark div / DuckDB // shared semantics), and the degenerate
single-day NULL path the sf corpora never exercise."""
import datetime

from pdf_extractor_spark.operators.aggregates import q_groupwise_trend

BASE = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [
            (i, BASE + datetime.timedelta(days=day), uid, et, v)
            for i, (uid, et, day, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_trend_slopes(spark, tmp_path):
    rows = [
        # user 1 click: y = 100 + 200x cents on days 0/1/2 -> slope
        # exactly 200 cents/day = 200_000_000 ppm
        (1, "click", 0, 1.00),
        (1, "click", 1, 3.00),
        (1, "click", 2, 5.00),
        # user 1 view: decreasing 5.00 -> 2.00 over 3 days -> slope
        # -100 cents/day; truncation toward zero must hold for the
        # negative numerator
        (1, "view", 0, 5.00),
        (1, "view", 3, 2.00),
        # user 2 click: all events on ONE day -> zero denominator ->
        # slope_ppm NULL (nullif), sufficient stats still emitted
        (2, "click", 5, 1.00),
        (2, "click", 5, 9.00),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        (r["user_id"], r["event_type"]): r
        for r in q_groupwise_trend(spark, str(tmp_path)).collect()
    }
    assert len(out) == 3

    r = out[(1, "click")]
    assert (r["n"], r["sx"], r["sy"]) == (3, 3, 900)
    assert r["slope_ppm"] == 200_000_000

    r = out[(1, "view")]
    assert r["slope_ppm"] == -100_000_000

    r = out[(2, "click")]
    assert r["slope_ppm"] is None
    assert (r["n"], r["sx"], r["sy"]) == (2, 10, 1000)


def test_trend_truncates_toward_zero(spark, tmp_path):
    # days 0/1/3, y cents 1/0/0: n=3 Sx=4 Sy=1 Sxx=10 Sxy=0 ->
    # num = -4, den = 14, slope = -4e6/14 = -285714.28... -> toward-zero
    # truncation gives -285714 on BOTH engines; floor would be -285715.
    rows = [
        (1, "click", 0, 0.01),
        (1, "click", 1, 0.0),
        (1, "click", 3, 0.0),
    ]
    _write_events(spark, tmp_path, rows)
    (r,) = q_groupwise_trend(spark, str(tmp_path)).collect()
    assert (r["n"], r["sx"], r["sy"], r["sxx"], r["sxy"]) == (3, 4, 1, 10, 0)
    assert r["slope_ppm"] == -285_714
