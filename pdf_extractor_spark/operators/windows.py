"""Window/sequence operators over the ``events`` table.

Reference ops covered: W1 (lead end-page), W2 (running-balance
classification), W5 (stable ordering), W8 (sessionization), plus an as-of
lookup (the J-family's temporal analog). All pure built-ins — zero Python in
the hot path.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_SECONDS = 1800


def _events(spark, sf_dir):
    from . import load
    # Parquet stores ts as TIMESTAMP_NTZ (naive). unix_micros would require a
    # cast through TIMESTAMP, which silently shifts by the *session* timezone
    # — wrong under any non-UTC driver. timestampdiff against an NTZ epoch
    # literal is timezone-independent and matches DuckDB's epoch_us.
    return load(spark, sf_dir, "events").withColumn(
        "ep",
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', cast(ts as timestamp_ntz))"
        ),
    )


def _user_order():
    # ep is an injective image of ts -> identical ordering, numeric windows.
    return Window.partitionBy("user_id").orderBy("ep", "event_id")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: gap>30min session ids per user; returns per-user session counts.
    Classic lag -> boundary flag -> running sum."""
    ev = _events(spark, sf_dir)
    w = _user_order()
    gap = F.col("ep") - F.lag("ep").over(w)
    with_flag = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0),
    )
    with_session = with_flag.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return with_session.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def q_balance_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: running-balance DEBIT/CREDIT/UNCLEAR classification. ``value``
    plays the running balance; the implied transaction amount is |diff| with
    the reference's 1%-of-diff tolerance arithmetic."""
    ev = _events(spark, sf_dir)
    w = _user_order()
    prev = F.lag("value").over(w)
    diff = F.col("value") - prev
    amount = F.round(F.abs(diff), 2)
    tol = F.abs(diff) * 0.01
    return ev.select(
        "event_id",
        "user_id",
        F.when(prev.isNull(), F.lit(""))
        .when(F.abs(diff - amount) < tol, F.lit("CREDIT"))
        .when(F.abs(diff + amount) < tol, F.lit("DEBIT"))
        .otherwise(F.lit("UNCLEAR"))
        .alias("transaction_type"),
        F.when(prev.isNull(), F.lit(-1.0)).otherwise(amount).alias("classified_amount"),
    )


def q_lead_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: each event's 'end' is the next event's start (lead), defaulting to
    the partition max — the outline end-page pattern."""
    ev = _events(spark, sf_dir)
    w = _user_order()
    wall = Window.partitionBy("user_id")
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(
            F.lead("ep").over(w), F.max("ep").over(wall)
        ).alias("end_us"),
    )


def q_asof_prev_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as a window: for each purchase, the user's most
    recent prior (or same-instant) signup timestamp."""
    ev = _events(spark, sf_dir)
    w = _user_order().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", F.col("ep")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("prev_signup_us", F.coalesce(last_signup, F.lit(-1)))
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "prev_signup_us")
    )


ORACLES = {
    "sessionize": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > {SESSION_GAP_SECONDS} * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, event_id,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id, max(session_id)::BIGINT AS n_sessions,
               count(*) AS n_events
        FROM sessions GROUP BY user_id
    """,
    "balance_classify": """
        WITH d AS (
            SELECT event_id, user_id,
                   value - lag(value) OVER w AS diff
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id,
               CASE WHEN diff IS NULL THEN ''
                    WHEN abs(diff - round(abs(diff), 2)) < abs(diff) * 0.01 THEN 'CREDIT'
                    WHEN abs(diff + round(abs(diff), 2)) < abs(diff) * 0.01 THEN 'DEBIT'
                    ELSE 'UNCLEAR' END AS transaction_type,
               CASE WHEN diff IS NULL THEN -1.0
                    ELSE round(abs(diff), 2) END AS classified_amount
        FROM d
    """,
    "lead_boundary": """
        SELECT event_id, user_id,
               coalesce(
                   epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)),
                   epoch_us(max(ts) OVER (PARTITION BY user_id))
               ) AS end_us
        FROM events
    """,
    "asof_prev_signup": """
        WITH x AS (
            SELECT event_id, user_id, event_type,
                   last_value(CASE WHEN event_type = 'signup'
                                   THEN epoch_us(ts) END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS prev_signup_us
            FROM events
        )
        SELECT event_id, user_id, coalesce(prev_signup_us, -1) AS prev_signup_us
        FROM x WHERE event_type = 'purchase'
    """,
}

QUERIES = {
    "sessionize": q_sessionize,
    "balance_classify": q_balance_classify,
    "lead_boundary": q_lead_boundary,
    "asof_prev_signup": q_asof_prev_signup,
}
