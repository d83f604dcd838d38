"""Sequence-grammar audit (agent.sequence_grammar_audit): crafted action
streams pin every violation kind, the precedence order, the clean-sequence
path (never exercised at sf0.01 — every driver user violates something),
and the transcript binding via events_from_transcripts."""
import datetime

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.agent import (
    events_from_transcripts,
    sequence_grammar_audit,
)

BASE = datetime.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, BASE + datetime.timedelta(seconds=30 * i), uid, et, 1.0)
            for i, (uid, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double",
    ).withColumn(
        "ep",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ),
    )


def test_grammar_kinds(spark):
    rows = [
        # user 1: clean funnel — signup, view, click, purchase
        (1, "signup"), (1, "view"), (1, "click"), (1, "purchase"),
        # user 2: opens with purchase -> bad_start at pos 1; the SAME
        # event is not also blind_purchase (precedence: first match)
        (2, "purchase"), (2, "view"),
        # user 3: signup mid-stream -> dup_signup at pos 2
        (3, "view"), (3, "signup"),
        # user 4: purchase after error -> blind_purchase at pos 3
        (4, "view"), (4, "error"), (4, "purchase"),
        # user 5: two consecutive errors -> error_storm at pos 3;
        # purchase directly after purchase is LEGAL (one checkout, two
        # items)
        (5, "view"), (5, "error"), (5, "error"), (5, "purchase"),
    ]
    out = {
        r["user_id"]: r
        for r in sequence_grammar_audit(_ev(spark, rows)).collect()
    }
    assert out[1]["is_valid"] == 1 and out[1]["n_violations"] == 0
    assert out[1]["first_bad_pos"] is None
    assert out[1]["first_bad_kind"] is None

    assert (out[2]["first_bad_pos"], out[2]["first_bad_kind"]) == (
        1, "bad_start")
    assert out[2]["n_violations"] == 1

    assert (out[3]["first_bad_pos"], out[3]["first_bad_kind"]) == (
        2, "dup_signup")
    assert (out[4]["first_bad_pos"], out[4]["first_bad_kind"]) == (
        3, "blind_purchase")
    # user 5: error at pos 3 is a storm; the purchase at pos 4 follows
    # an error -> ALSO blind_purchase, so 2 violations, first is pos 3
    assert (out[5]["first_bad_pos"], out[5]["first_bad_kind"]) == (
        3, "error_storm")
    assert out[5]["n_violations"] == 2
    assert out[5]["is_valid"] == 0


def test_grammar_over_transcripts(spark):
    # Role-alternation reading: conversation c1 opens with a tool call
    # (not signup/view) -> bad_start; c2 has no rule hits at all.
    t = spark.createDataFrame(
        [
            ("c1", 0, "assistant", "purchase", BASE),
            ("c1", 1, "user", None, BASE + datetime.timedelta(seconds=5)),
            ("c2", 0, "view", None, BASE),
        ],
        "conv_id string, turn_idx int, role string, tool string,"
        " ts timestamp_ntz",
    )
    out = sequence_grammar_audit(events_from_transcripts(t)).collect()
    by_valid = sorted((r["is_valid"], r["n_events"]) for r in out)
    assert by_valid == [(0, 2), (1, 1)]
