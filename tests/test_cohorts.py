"""Cohort retention and funnel conversion: crafted event streams with
known answers (purchase-before-signup excluded, 7-day boundary)."""
from datetime import datetime

from pdf_extractor_spark.operators.windows import (
    q_cohort_retention,
    q_funnel_conversion,
)


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _d(day, h=0):
    return datetime(2024, 1, day, h)


def test_retention_triangle(spark, tmp_path):
    rows = [
        # user 1: active weeks 0, 1, 2; user 2: weeks 0, 2; user 3: week 1
        (1, _d(1), 1, "view", 0.0, "{}"),
        (2, _d(8), 1, "view", 0.0, "{}"),
        (3, _d(15), 1, "view", 0.0, "{}"),
        (4, _d(2), 2, "click", 0.0, "{}"),
        (5, _d(16), 2, "view", 0.0, "{}"),
        (6, _d(9), 3, "view", 0.0, "{}"),
        (7, _d(9, 5), 3, "view", 0.0, "{}"),  # same week, still 1 row
    ]
    sf = _write(spark, tmp_path, rows)
    got = {
        (r["cohort_wk"], r["week_offset"]): r["n_users"]
        for r in q_cohort_retention(spark, sf).collect()
    }
    assert got == {
        (0, 0): 2,  # users 1, 2
        (0, 1): 1,  # user 1
        (0, 2): 2,  # users 1, 2
        (1, 0): 1,  # user 3
    }


def test_funnel_boundaries(spark, tmp_path):
    rows = [
        # user 1: converts on day 7 exactly
        (1, _d(1), 1, "signup", 0.0, "{}"),
        (2, _d(8), 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE signup only -> not converted
        (3, _d(2), 2, "purchase", 1.0, "{}"),
        (4, _d(3), 2, "signup", 0.0, "{}"),
        # user 3: purchase 8 days after -> outside the window
        (5, _d(1), 3, "signup", 0.0, "{}"),
        (6, _d(10), 3, "purchase", 1.0, "{}"),
        # user 4: no purchase
        (7, _d(4), 4, "signup", 0.0, "{}"),
    ]
    sf = _write(spark, tmp_path, rows)
    got = {
        r["cohort_wk"]: (r["n_signups"], r["n_converted_7d"])
        for r in q_funnel_conversion(spark, sf).collect()
    }
    assert got == {0: (4, 1)}
