"""Warehouse-maintenance operators: SCD Type-2 dimension history and
right-to-be-forgotten (GDPR) erasure propagation with an audit trail —
the table-maintenance jobs every production lakehouse runs beside its
analytics.

Both are pure DataFrame constructions with per-user-bounded windows or
key-anti-joins — nothing here shuffles more than once per keyed step.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

TIER_WIDTH_CENTS = 10_000   # purchase-value cents per tier step
OPEN_END = -1               # valid_to sentinel for the current row
PURGE_MOD = 37              # deletion list fixture: user_id % 37 == 0


def _ep(col: str = "ts") -> F.Column:
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast({col} as timestamp_ntz))"
    )


def scd2_history(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension (type 2) history of each user's purchase
    tier: one row per tier EPISODE with [valid_from, valid_to) bounds and
    an is_current flag. Change detection is lag() over the user's ordered
    purchases (keep rows where the tier differs from the previous one);
    episode close is lead() over the kept change rows. Two per-user
    windows, both bounded by the user's own history — the standard
    distributed SCD2 build, no cross-user traffic at all."""
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            _ep().alias("ep"),
            F.expr(
                f"div(CAST(round(value * 100) AS long), {TIER_WIDTH_CENTS})"
            ).alias("tier"),
        )
    )
    changes = (
        purchases.withColumn("prev_tier", F.lag("tier").over(w))
        .where(
            F.col("prev_tier").isNull()
            | (F.col("tier") != F.col("prev_tier"))
        )
        .select("user_id", "event_id", "ep", "tier")
    )
    w2 = Window.partitionBy("user_id").orderBy("ep", "event_id")
    nxt = F.lead("ep").over(w2)
    return changes.select(
        "user_id",
        "tier",
        F.col("ep").alias("valid_from_us"),
        F.coalesce(nxt - 1, F.lit(OPEN_END)).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


def q_scd2_user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load

    return scd2_history(load(spark, sf_dir, "events"))


def q_purge_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation, audited: a deletion list (fixture:
    every PURGE_MOD-th user) anti-joins the event stream; the output is the
    audit row a compliance job must emit — users requested, users actually
    present, rows deleted, rows kept, and a verification count proving no
    purged user survives in the kept set (must be 0 by construction, but
    the audit MEASURES it rather than assuming).

    Scale shape: the deletion list is orders smaller than the stream —
    broadcast anti-join, one scan, no shuffle of the big side."""
    from . import load

    ev = load(spark, sf_dir, "events")
    requests = (
        ev.select("user_id").distinct()
        .where(F.col("user_id") % PURGE_MOD == 0)
    )
    kept = ev.join(F.broadcast(requests), "user_id", "left_anti")
    leaked = kept.join(F.broadcast(requests), "user_id", "left_semi")
    stats = ev.agg(
        F.count("*").alias("n_events_before"),
        F.countDistinct("user_id").alias("n_users_before"),
    )
    return (
        stats.crossJoin(
            F.broadcast(requests.agg(F.count("*").alias("n_purge_users")))
        )
        .crossJoin(
            F.broadcast(kept.agg(F.count("*").alias("n_events_after")))
        )
        .crossJoin(
            F.broadcast(leaked.agg(F.count("*").alias("n_leaked")))
        )
        .select(
            "n_events_before",
            "n_users_before",
            "n_purge_users",
            "n_events_after",
            (F.col("n_events_before") - F.col("n_events_after")).alias(
                "n_events_deleted"
            ),
            "n_leaked",
        )
    )


QUERIES = {
    "scd2_user_tiers": q_scd2_user_tiers,
    "purge_users": q_purge_users,
}

ORACLES = {
    "scd2_user_tiers": f"""
        WITH p AS (
            SELECT user_id, event_id, epoch_us(ts) AS ep,
                   round(value * 100)::BIGINT // {TIER_WIDTH_CENTS} AS tier
            FROM events WHERE event_type = 'purchase'
        ), ch AS (
            SELECT user_id, event_id, ep, tier
            FROM (
                SELECT *, lag(tier) OVER
                       (PARTITION BY user_id ORDER BY ep, event_id)
                       AS prev_tier
                FROM p
            )
            WHERE prev_tier IS NULL OR tier <> prev_tier
        )
        SELECT user_id, tier,
               ep AS valid_from_us,
               coalesce(lead(ep) OVER
                   (PARTITION BY user_id ORDER BY ep, event_id) - 1,
                   {OPEN_END}) AS valid_to_us,
               (lead(ep) OVER
                   (PARTITION BY user_id ORDER BY ep, event_id) IS NULL)
                   AS is_current
        FROM ch
    """,
    "purge_users": f"""
        WITH req AS (
            SELECT DISTINCT user_id FROM events
            WHERE user_id % {PURGE_MOD} = 0
        ), kept AS (
            SELECT * FROM events
            WHERE user_id NOT IN (SELECT user_id FROM req)
        )
        SELECT (SELECT count(*) FROM events) AS n_events_before,
               (SELECT count(DISTINCT user_id) FROM events)
                   AS n_users_before,
               (SELECT count(*) FROM req) AS n_purge_users,
               (SELECT count(*) FROM kept) AS n_events_after,
               (SELECT count(*) FROM events)
                   - (SELECT count(*) FROM kept) AS n_events_deleted,
               (SELECT count(*) FROM kept
                WHERE user_id IN (SELECT user_id FROM req)) AS n_leaked
    """,
}
