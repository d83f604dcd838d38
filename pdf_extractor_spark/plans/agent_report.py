"""Agent-corpus data card: one job composing every agent-analytics stage
over a transcript frame into a single tall report table.

Sections (all values integer-exact, each stage individually
oracle-checked via its `queries()` twin on the events table):

    tool_retry   — per tool: calls, retries, recoveries, retry permille
    tool_latency — per tool: gap count, p50/p90/p99 inter-action micros
    trie_profile — per depth: active convs, distinct prefixes, diversity
    prefix_dedup — corpus rollup: convs, convs sharing a depth>=2 prefix,
                   deepest shared prefix
    adjacent_dup — corpus rollup: turns, adjacent same-content collapsed

Output schema: (section string, key string, metric string, value long) —
the tall shape a dashboard or data-card renderer ingests directly.

Shuffle budget: the adapter is a pure projection; each section is one lag
window and/or one hash aggregate (see operators/agent.py scale notes);
the final union is plan-level only. This module pins that the certified
stages COMPOSE (tests/test_agent_report.py + the /verify drive) — the
curate() convention applied to the agent-analytics family.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.agent import (
    action_trie_profile,
    adjacent_dup_collapse,
    events_from_transcripts,
    prefix_dedup,
    tool_latency_quantiles,
    tool_retry_stats,
)

def _tall(df: DataFrame, section: str, key_col, metrics: list) -> DataFrame:
    pairs = ", ".join(f"'{m}', cast({m} as long)" for m in metrics)
    return df.select(
        F.lit(section).alias("section"),
        F.col(key_col).cast("string").alias("key"),
        F.expr(f"stack({len(metrics)}, {pairs}) as (metric, value)"),
    )


def agent_report(transcripts: DataFrame) -> DataFrame:
    """Transcripts -> the tall data-card frame (see module docstring).

    The adapted stream is localCheckpointed ONCE and every section reads
    it — without this, the five-branch union would re-run the source
    lineage (a generator's mapInPandas, a remote scan) five times."""
    evc = events_from_transcripts(
        transcripts, keep_text=True
    ).localCheckpoint(eager=True)
    ev = evc.select("user_id", "event_id", "ep", "event_type")

    retry = _tall(
        tool_retry_stats(ev),
        "tool_retry",
        "tool",
        ["n_calls", "n_retries", "n_recoveries", "retry_permille"],
    )
    latency = _tall(
        tool_latency_quantiles(ev),
        "tool_latency",
        "tool",
        ["n_gaps", "p50_us", "p90_us", "p99_us"],
    )
    trie = _tall(
        action_trie_profile(ev),
        "trie_profile",
        "d",
        ["n_active", "n_prefixes", "diversity_permille"],
    )
    pd_roll = _tall(
        prefix_dedup(ev).agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum(
                (F.col("max_shared_depth") >= 2).cast("long")
            ).alias("n_shared_depth2"),
            F.max("max_shared_depth").alias("deepest_shared"),
        ).withColumn("key", F.lit("corpus")),
        "prefix_dedup",
        "key",
        ["n_convs", "n_shared_depth2", "deepest_shared"],
    )
    adj_roll = _tall(
        adjacent_dup_collapse(evc).agg(
            F.sum("n_events").alias("n_turns"),
            F.sum("n_collapsed").alias("n_collapsed"),
        ).withColumn("key", F.lit("corpus")),
        "adjacent_dup",
        "key",
        ["n_turns", "n_collapsed"],
    )
    return retry.unionByName(latency).unionByName(trie).unionByName(
        pd_roll
    ).unionByName(adj_roll)
