"""Time-weighted average and last-touch attribution: crafted streams with
hand-computed integer answers."""
from datetime import datetime, timedelta

from pdf_extractor_spark.operators.windows import (
    q_purchase_attribution,
    q_time_weighted_avg,
)


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


_T0 = datetime(2024, 1, 1)


def _t(seconds):
    return _T0 + timedelta(seconds=seconds)


def test_twa_weights_by_duration(spark, tmp_path):
    rows = [
        # user 1: 1.00 held 10 s, 3.00 held 30 s, final sample open-ended
        (1, _t(0), 1, "view", 1.00, "{}"),
        (2, _t(10), 1, "view", 3.00, "{}"),
        (3, _t(40), 1, "view", 9.99, "{}"),
        # user 2: single event -> no interval -> excluded
        (4, _t(0), 2, "view", 5.00, "{}"),
    ]
    sf = _write(spark, tmp_path, rows)
    got = {r["user_id"]: r for r in q_time_weighted_avg(spark, sf).collect()}
    assert set(got) == {1}
    assert got[1]["total_dur_us"] == 40_000_000
    # (10s*100c + 30s*300c) / 40s = 250c — NOT the plain mean (133c/166c)
    assert got[1]["twa_cents"] == 250


def test_attribution_last_touch_and_direct(spark, tmp_path):
    rows = [
        # user 1: view -> purchase(5.00) -> click -> purchase(2.00)
        (1, _t(0), 1, "view", 0.10, "{}"),
        (2, _t(10), 1, "purchase", 5.00, "{}"),
        (3, _t(20), 1, "click", 0.10, "{}"),
        (4, _t(30), 1, "purchase", 2.00, "{}"),
        # user 2: purchase with no preceding touch -> direct
        (5, _t(0), 2, "purchase", 1.00, "{}"),
        # a purchase is never its own touch: purchase -> purchase is direct
        (6, _t(10), 2, "purchase", 3.00, "{}"),
    ]
    sf = _write(spark, tmp_path, rows)
    got = {
        r["touch_type"]: (r["n_purchases"], r["attributed_cents"])
        for r in q_purchase_attribution(spark, sf).collect()
    }
    assert got == {
        "view": (1, 500),
        "click": (1, 200),
        "direct": (2, 400),
    }


def test_funnel_steps_strict_order_and_windows(spark, tmp_path):
    from pdf_extractor_spark.operators.windows import q_funnel_steps

    day = 86400
    rows = [
        # user 1: full funnel inside the windows
        (1, _t(0), 1, "signup", 0.0, "{}"),
        (2, _t(day), 1, "view", 0.0, "{}"),
        (3, _t(2 * day), 1, "purchase", 0.0, "{}"),
        # user 2: view BEFORE signup -> never step 2 (strict order)
        (4, _t(day), 2, "view", 0.0, "{}"),
        (5, _t(2 * day), 2, "signup", 0.0, "{}"),
        # user 3: view 8 days after signup -> outside the step window
        (6, _t(0), 3, "signup", 0.0, "{}"),
        (7, _t(8 * day), 3, "view", 0.0, "{}"),
        # user 4: purchase anchored on the VIEW: signup d0, view d6,
        # purchase d12 -> 6d from view = converts (12d from signup)
        (8, _t(0), 4, "signup", 0.0, "{}"),
        (9, _t(6 * day), 4, "view", 0.0, "{}"),
        (10, _t(12 * day), 4, "purchase", 0.0, "{}"),
    ]
    sf = _write(spark, tmp_path, rows)
    r = q_funnel_steps(spark, sf).collect()[0]
    assert (r["n_step1"], r["n_step2"], r["n_step3"]) == (4, 2, 2)
