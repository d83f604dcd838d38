

def test_week_bucketing_floors_pre_epoch_dates(spark):
    """BOTH engines truncate integer division toward zero (Spark `div` and
    DuckDB `//` alike: -4 -> 0), which merges the week before the epoch
    into week 0. Calendar bucketing must FLOOR, so each side carries an
    explicit floor form — floordiv_sql on Spark, floordiv_duck in the
    oracles — and they must agree with Python `//` on negatives."""
    import duckdb
    from pyspark.sql import functions as F

    from pdf_extractor_spark.functions.expressions import (
        floordiv_duck,
        floordiv_sql,
    )
    from pdf_extractor_spark.operators.windows import _WK

    rows = [
        ("2023-12-28", -4),   # -> week -1 (truncation would say 0)
        ("2023-12-18", -14),  # -> week -2 (exact multiple)
        ("2024-01-05", 4),    # -> week 0
        ("2022-01-01", -730),
    ]
    df = spark.createDataFrame(rows, "d string, dd long").select(
        F.col("d").cast("timestamp_ntz").alias("ts")
    )
    got = [r[0] for r in df.select(F.expr(_WK).cast("long")).collect()]
    want_duck = [
        duckdb.sql(f"SELECT {floordiv_duck(str(dd), 7)}").fetchone()[0]
        for _, dd in rows
    ]
    want_py = [dd // 7 for _, dd in rows]
    assert got == want_duck == want_py == [-1, -2, 0, -105]

    # the helper itself, over negative dividends and both signs of b's use
    pairs = [(-4, 7), (-14, 7), (4, 7), (-1, 24), (-25, 24), (0, 7)]
    exprs = [floordiv_sql(str(a), b) for a, b in pairs]
    row = spark.range(1).select(
        *[F.expr(e).alias(f"c{i}") for i, e in enumerate(exprs)]
    ).first()
    assert list(row) == [a // b for a, b in pairs]


def test_markov_rows_and_permille(spark):
    from pdf_extractor_spark.operators.windows import q_markov_transitions

    rows = q_markov_transitions(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, grp in by_prev.items():
        total_permille = sum(r["permille"] for r in grp)
        # integer floor division: the row permilles sum to <= 1000 and
        # within len(grp) of it
        assert 1000 - len(grp) <= total_permille <= 1000, prev


def test_hourly_spine_fills_gaps_with_locf(spark, tmp_path):
    import datetime

    from pdf_extractor_spark.operators.windows import q_hourly_spine_ffill

    base = datetime.datetime(2024, 1, 1)
    # hours 0 and 3 have data; 1-2 are gaps to fill with hour 0's sum
    rows = [
        (0, base, 1, "click", 2.0),
        (1, base + datetime.timedelta(minutes=10), 2, "click", 3.0),
        (2, base + datetime.timedelta(hours=3), 1, "click", 7.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["hour_b"]: (r["is_gap"], r["cents_filled"])
        for r in q_hourly_spine_ffill(spark, str(tmp_path)).collect()
    }
    lo = min(got)
    assert len(got) == 4
    assert got[lo] == (0, 500)
    assert got[lo + 1] == (1, 500)
    assert got[lo + 2] == (1, 500)
    assert got[lo + 3] == (0, 700)


def test_type_share_drift_exact_tvd(spark, tmp_path):
    """Hand-computed TVD on a 3-day corpus, including a type that vanishes
    (union-support term with a zero side) and a calendar gap (day 3 absent
    -> day 4 excluded: no prior day, drift-vs-silence is rate_spike's job)."""
    import datetime

    from pdf_extractor_spark.operators.aggregates import q_type_share_drift

    base = datetime.datetime(2024, 1, 1)
    # day 0: 2 click, 2 view (N=4); day 1: 3 click, 1 error (N=4);
    # day 3: 1 view (N=1) — day 2 silent, so day 3 has no consecutive prior
    rows = [
        (0, base, 1, "click", 1.0),
        (1, base + datetime.timedelta(hours=1), 1, "click", 1.0),
        (2, base + datetime.timedelta(hours=2), 1, "view", 1.0),
        (3, base + datetime.timedelta(hours=3), 1, "view", 1.0),
        (4, base + datetime.timedelta(days=1), 1, "click", 1.0),
        (5, base + datetime.timedelta(days=1, hours=1), 1, "click", 1.0),
        (6, base + datetime.timedelta(days=1, hours=2), 1, "click", 1.0),
        (7, base + datetime.timedelta(days=1, hours=3), 1, "error", 1.0),
        (8, base + datetime.timedelta(days=3), 1, "view", 1.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r["day_b"]: r for r in q_type_share_drift(spark, str(tmp_path)).collect()}
    day0 = 19723  # 2024-01-01 as epoch days
    # only day 1 has a consecutive prior day
    assert set(got) == {day0 + 1}
    r = got[day0 + 1]
    # terms (cnt_d * N_prev - cnt_prev * N_d), N_d = N_prev = 4:
    #   click |3*4 - 2*4| = 4; view |0*4 - 2*4| = 8; error |1*4 - 0*4| = 4
    assert (r["tvd_num"], r["tvd_den"]) == (16, 32)
    # TVD = 16/32 = 0.5 -> 500000 ppm >= 70000 -> drift
    assert (r["tvd_ppm"], r["is_drift"]) == (500000, 1)
