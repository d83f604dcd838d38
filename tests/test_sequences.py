"""Sequential-pattern mining and Bradley-Terry fit: crafted event streams
with known supports, win matrices with known rating order, and the
tie/threshold boundaries pinned."""
from datetime import datetime

from pdf_extractor_spark.operators.sequences import (
    BT_SCALE,
    MIN_SUPPORT_USERS,
    _bt_ratings,
    q_bradley_terry,
    q_sequential_patterns,
)


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _d(day, h=0, m=0):
    return datetime(2024, 1, day, h, m)


def test_sequential_patterns_support_threshold(spark, tmp_path):
    rows = []
    eid = 0
    # MIN_SUPPORT_USERS users perform view -> click -> purchase
    for u in range(MIN_SUPPORT_USERS):
        for i, t in enumerate(["view", "click", "purchase"]):
            rows.append((eid, _d(1, 0, i), u, t, 1.0, "{}"))
            eid += 1
    # one user performs view -> view -> error (below threshold)
    for i, t in enumerate(["view", "view", "error"]):
        rows.append((eid, _d(1, 0, i), 99, t, 1.0, "{}"))
        eid += 1
    sf = _write(spark, tmp_path, rows)
    got = {
        (r["t1"], r["t2"], r["t3"]): (r["n_occurrences"], r["n_users"])
        for r in q_sequential_patterns(spark, sf).collect()
    }
    assert got == {
        ("view", "click", "purchase"): (
            MIN_SUPPORT_USERS,
            MIN_SUPPORT_USERS,
        )
    }


def test_sequential_patterns_ordering_is_per_user_time(spark, tmp_path):
    # interleaved timestamps across users must not mix sequences: each
    # user's own order produces the trigram, support counts users once
    rows = []
    eid = 0
    for u in range(MIN_SUPPORT_USERS):
        for i, t in enumerate(["signup", "view", "purchase"]):
            # user u's events interleave in global time with other users'
            rows.append((eid, _d(1, i, u), u, t, 1.0, "{}"))
            eid += 1
        # a second occurrence for user 0 only: n_occurrences > n_users
        if u == 0:
            for i, t in enumerate(["signup", "view", "purchase"]):
                rows.append((eid, _d(2, i), u, t, 1.0, "{}"))
                eid += 1
    sf = _write(spark, tmp_path, rows)
    out = q_sequential_patterns(spark, sf).collect()
    row = next(
        r
        for r in out
        if (r["t1"], r["t2"], r["t3"]) == ("signup", "view", "purchase")
    )
    assert row["n_users"] == MIN_SUPPORT_USERS
    assert row["n_occurrences"] == MIN_SUPPORT_USERS + 1
    # user 0's day-2 repeat also creates cross-boundary trigrams
    # (purchase, signup, view) / (view, purchase, signup) for user 0 only
    # - below the user-support threshold, so absent
    assert len(out) == 1


def test_bt_ratings_symmetric_wins_tie():
    rows = [
        {"w_type": "a", "l_type": "b", "n": 5},
        {"w_type": "b", "l_type": "a", "n": 5},
    ]
    fitted = _bt_ratings(rows)
    assert fitted["a"] == fitted["b"]
    rating, n_wins, n_matches = fitted["a"]
    assert (n_wins, n_matches) == (5, 10)
    # balanced matrix: MM keeps ratings at the starting scale
    assert abs(rating - BT_SCALE) <= 1


def test_bt_ratings_dominance_order():
    # a > b > c in wins; shut-out loser floors at rating 0
    rows = [
        {"w_type": "a", "l_type": "b", "n": 8},
        {"w_type": "b", "l_type": "a", "n": 2},
        {"w_type": "b", "l_type": "c", "n": 9},
    ]
    fitted = _bt_ratings(rows)
    assert fitted["a"][0] > fitted["b"][0] > fitted["c"][0]
    assert fitted["c"][0] == 0  # zero wins -> zero rating
    assert fitted["a"][1:] == (8, 10)
    assert fitted["b"][1:] == (11, 19)


def test_bradley_terry_ties_and_same_type_skipped(spark, tmp_path):
    # user 1: purchase(3.00) -> view(1.00): purchase beats view
    #         view(1.00) -> view(2.00): same type, skipped
    #         view(2.00) -> click(2.00): tie cents, skipped
    rows = [
        (1, _d(1, 0), 1, "purchase", 3.00, "{}"),
        (2, _d(1, 1), 1, "view", 1.00, "{}"),
        (3, _d(1, 2), 1, "view", 2.00, "{}"),
        (4, _d(1, 3), 1, "click", 2.00, "{}"),
    ]
    sf = _write(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in q_bradley_terry(spark, sf).collect()}
    assert set(got) == {"purchase", "view"}
    assert got["purchase"]["n_wins"] == 1
    assert got["purchase"]["n_matches"] == 1
    assert got["view"]["n_wins"] == 0
    assert got["view"]["rating"] == 0
    assert got["purchase"]["rating"] > 0
