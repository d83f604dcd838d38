"""SCD2 history invariants and GDPR purge audit."""
import datetime

from pdf_extractor_spark.operators import warehouse


def _events(spark, rows):
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


def test_scd2_episodes(spark):
    rows = [
        (1, 7, "purchase", 50.0, 10),    # tier 0 (5000 cents)
        (2, 7, "purchase", 70.0, 20),    # tier 0 — no change, folded in
        (3, 7, "purchase", 150.0, 30),   # tier 1 — episode change
        (4, 7, "purchase", 250.0, 40),   # tier 2 — episode change
        (5, 7, "click", 999.0, 50),      # ignored: not a purchase
        (6, 8, "purchase", 10.0, 15),    # other user, single episode
    ]
    out = sorted(
        warehouse.scd2_history(_events(spark, rows)).collect(),
        key=lambda r: (r.user_id, r.valid_from_us),
    )
    u7 = [r for r in out if r.user_id == 7]
    assert [r.tier for r in u7] == [0, 1, 2]
    # episodes tile the timeline: each closes 1us before the next opens
    assert u7[0].valid_to_us == u7[1].valid_from_us - 1
    assert u7[1].valid_to_us == u7[2].valid_from_us - 1
    assert u7[2].valid_to_us == warehouse.OPEN_END and u7[2].is_current
    assert not u7[0].is_current and not u7[1].is_current
    u8 = [r for r in out if r.user_id == 8]
    assert len(u8) == 1 and u8[0].is_current


def test_purge_audit(spark):
    row = warehouse.q_purge_users(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.n_leaked == 0
    assert row.n_events_after + row.n_events_deleted == row.n_events_before
    assert row.n_purge_users > 0 and row.n_events_deleted > 0
