"""OLAP constructs: pivot / rollup / ntile / range-frame rolling windows.
Exact-value parity with DuckDB is the oracle gate's job; these tests pin
the local semantics on crafted rows."""
import datetime

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.olap import (
    q_pivot_weekday,
    q_rolling_week_spend,
    q_rollup_region_nation,
    q_user_value_quartiles,
)

SF = "/root/testdata/sf0.001"


def test_pivot_rows_and_totals(spark):
    out = q_pivot_weekday(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert len(out) == ev.select("event_type").distinct().count()
    # pivoted cells sum back to the plain count
    total = sum(sum(r[f"wd{d}_n"] for d in range(7)) for r in out)
    assert total == ev.count()


def test_rollup_levels_reconcile(spark):
    rows = q_rollup_region_nation(spark, SF).collect()
    grand = [r for r in rows if r["gid"] == 3]
    regions = [r for r in rows if r["gid"] == 1]
    leaves = [r for r in rows if r["gid"] == 0]
    assert len(grand) == 1
    assert grand[0]["n_cust"] == sum(r["n_cust"] for r in regions)
    assert grand[0]["acctbal_cents"] == sum(r["acctbal_cents"] for r in leaves)
    # every region subtotal equals the sum of its nation leaves
    for reg in regions:
        mine = [r for r in leaves if r["r_name"] == reg["r_name"]]
        assert reg["n_cust"] == sum(r["n_cust"] for r in mine)


def test_quartiles_are_balanced_per_user(spark):
    out = q_user_value_quartiles(spark, SF)
    per_user = out.groupBy("user_id").agg(
        F.max(F.col("n_events")).alias("mx"),
        F.min(F.col("n_events")).alias("mn"),
        F.sum("n_events").alias("n"),
        F.count("*").alias("n_q"),
    )
    for r in per_user.collect():
        # SQL ntile: bucket sizes differ by at most one
        assert r["mx"] - r["mn"] <= 1
        assert r["n_q"] <= 4


def test_rolling_window_matches_bruteforce(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=[0, 1, 3, 9, 10, 20][i]),
         1, "click", float(i + 1))
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["event_id"]: (r["rolling_n"], r["rolling_cents"])
        for r in q_rolling_week_spend(spark, str(tmp_path)).collect()
    }
    cents = [100, 200, 300, 400, 500, 600]
    days = [0, 1, 3, 9, 10, 20]
    for i in range(6):
        in_win = [j for j in range(6) if 0 <= days[i] - days[j] <= 7]
        assert got[i] == (len(in_win), sum(cents[j] for j in in_win)), i


def test_unpivot_roundtrips_pivot(spark):
    from pdf_extractor_spark.operators.olap import q_unpivot_weekday

    long_rows = q_unpivot_weekday(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # 7 slots per event type, totals conserved
    types = ev.select("event_type").distinct().count()
    assert len(long_rows) == 7 * types
    assert sum(r["n_events"] for r in long_rows) == ev.count()


def test_grouping_sets_custom_asymmetry(spark):
    from pdf_extractor_spark.operators.olap import q_grouping_sets_activity

    rows = q_grouping_sets_activity(spark, SF).collect()
    gids = {r["gid"] for r in rows}
    assert gids == {1, 2, 3}  # (event_type), (wd), () — never the cross cells
    total = [r for r in rows if r["gid"] == 3]
    by_type = [r for r in rows if r["gid"] == 1]
    by_wd = [r for r in rows if r["gid"] == 2]
    assert len(total) == 1
    assert total[0]["n_events"] == sum(r["n_events"] for r in by_type)
    assert total[0]["n_events"] == sum(r["n_events"] for r in by_wd)


def test_session_window_matches_sessionize_counts(spark):
    """Per-user session counts agree with the lag/running-sum sessionizer:
    same gap duration, same boundary (an exactly-gap pair merges; only a
    strictly greater gap splits — pinned at the boundary by
    test_session_window_boundary_semantics)."""
    from pdf_extractor_spark.operators.windows import (
        q_session_window_agg,
        q_sessionize,
    )

    native = (
        q_session_window_agg(spark, SF)
        .groupBy("user_id")
        .count()
        .collect()
    )
    classic = {
        r["user_id"]: r["n_sessions"] for r in q_sessionize(spark, SF).collect()
    }
    assert {r["user_id"]: r["count"] for r in native} == classic


def test_session_window_boundary_semantics(spark, tmp_path):
    """Spark merges an exactly-gap-apart pair into ONE session (only a
    strictly greater gap splits) — measured, and the DuckDB oracle must
    replay the same boundary on the same crafted fixture."""
    import datetime

    import duckdb

    from pdf_extractor_spark.operators.windows import (
        ORACLES,
        q_session_window_agg,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: exactly 1800s apart -> MERGES (one session)
        (0, base, 1, "click", 1.0),
        (1, base + datetime.timedelta(seconds=1800), 1, "click", 1.0),
        # user 2: 1801s apart -> splits
        (2, base, 2, "click", 1.0),
        (3, base + datetime.timedelta(seconds=1801), 2, "click", 1.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = sorted(
        map(tuple, q_session_window_agg(spark, str(tmp_path)).collect())
    )
    per_user = {}
    for r in got:
        per_user[r[0]] = per_user.get(r[0], 0) + 1
    assert per_user == {1: 1, 2: 2}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    want = sorted(
        (int(u), ws, we, int(n), int(c))
        for u, ws, we, n, c in con.execute(
            ORACLES["session_window_agg"]
        ).fetchall()
    )
    assert got == want


def test_cube_has_all_four_levels(spark):
    from pdf_extractor_spark.operators.olap import q_cube_type_weekday

    rows = q_cube_type_weekday(spark, SF).collect()
    assert {r["gid"] for r in rows} == {0, 1, 2, 3}
    grand = [r for r in rows if r["gid"] == 3]
    cross = [r for r in rows if r["gid"] == 0]
    assert len(grand) == 1
    assert grand[0]["n_events"] == sum(r["n_events"] for r in cross)


def test_outlier_zscore_exact_on_crafted_rows(spark, tmp_path):
    """99 values of 100 cents + one of 10000: the spike is > 3 sigma, the
    rest are not — checked against a float reference computation."""
    import datetime
    import statistics

    from pdf_extractor_spark.operators.olap import q_outlier_zscore

    cents = [100] * 99 + [10000]
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i), 1, "click", c / 100.0)
        for i, c in enumerate(cents)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = q_outlier_zscore(spark, str(tmp_path)).collect()[0]
    mean = statistics.fmean(cents)
    sigma = statistics.pstdev(cents)
    want = sum(1 for c in cents if abs(c - mean) > 3 * sigma)
    assert want == 1  # the spike, and only the spike
    assert (r["n_events"], r["n_outliers"], r["max_outlier_cents"]) == (
        100, 1, 10000,
    )
