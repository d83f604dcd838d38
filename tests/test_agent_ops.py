"""Agent-transcript analytics (operators/agent.py): the transcript-shape
adapter and both operators on hand-computed fixtures, plus the real
synthetic transcript corpus."""
import datetime as dt

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.agent import (
    MAX_PREFIX_DEPTH,
    events_from_transcripts,
    prefix_dedup,
    tool_retry_stats,
)

_TS = dt.datetime(2025, 1, 1)


def _ev(spark, rows):
    """rows: (user_id, event_id, ep_seconds, event_type)."""
    return spark.createDataFrame(
        [(u, e, s * 1_000_000, t) for u, e, s, t in rows],
        "user_id long, event_id long, ep long, event_type string",
    )


def test_tool_retry_counts_same_type_within_window(spark):
    ev = _ev(spark, [
        # user 1: search, search 10s later (retry), search 400s later (NOT
        # a retry - outside the 300s window), then error -> browser 5s
        # later (recovery)
        (1, 0, 0, "search"),
        (1, 1, 10, "search"),
        (1, 2, 410, "search"),
        (1, 3, 500, "error"),
        (1, 4, 505, "browser"),
        # user 2: error then error (retry of error, not a recovery)
        (2, 0, 0, "error"),
        (2, 1, 20, "error"),
    ])
    got = {r["tool"]: r for r in tool_retry_stats(ev).collect()}
    assert got["search"]["n_calls"] == 3
    assert got["search"]["n_retries"] == 1
    assert got["search"]["retry_permille"] == 333
    assert got["browser"]["n_recoveries"] == 1
    assert got["browser"]["n_retries"] == 0
    assert got["error"]["n_retries"] == 1  # user 2's repeat
    assert got["error"]["n_recoveries"] == 0  # error-after-error excluded


def test_prefix_dedup_depth_and_sharers(spark):
    # users 1,2 share [a,b,c] then diverge; user 3 shares only [a]... but a
    # depth-1 prefix 'a' is shared by all three.
    ev = _ev(spark, [
        (1, 0, 0, "a"), (1, 1, 1, "b"), (1, 2, 2, "c"), (1, 3, 3, "x"),
        (2, 0, 0, "a"), (2, 1, 1, "b"), (2, 2, 2, "c"), (2, 3, 3, "y"),
        (3, 0, 0, "a"), (3, 1, 1, "z"),
        (4, 0, 0, "q"),
    ])
    got = {r["user_id"]: r for r in prefix_dedup(ev).collect()}
    assert got[1]["max_shared_depth"] == 3 and got[1]["n_sharers"] == 2
    assert got[2]["max_shared_depth"] == 3 and got[2]["n_sharers"] == 2
    assert got[3]["max_shared_depth"] == 1 and got[3]["n_sharers"] == 3
    assert got[4]["max_shared_depth"] == 0 and got[4]["n_sharers"] == 0


def test_prefix_depth_is_capped(spark):
    # Two users identical for 20 steps: reported depth caps at
    # MAX_PREFIX_DEPTH, and the explode emits no deeper rows.
    rows = []
    for u in (1, 2):
        rows += [(u, i, i, f"t{i}") for i in range(20)]
    got = {r["user_id"]: r for r in prefix_dedup(_ev(spark, rows)).collect()}
    assert got[1]["max_shared_depth"] == MAX_PREFIX_DEPTH
    assert got[1]["n_sharers"] == 2


def test_transcript_adapter_runs_both_ops_on_real_corpus(spark):
    """The BASELINE.json transcript shape feeds both operators through
    events_from_transcripts: tool turns surface as their tool name, other
    turns as their role, and per-conversation turn order is the stream
    order."""
    from pdf_extractor_spark.sources.transcripts import transcripts_df

    ev = events_from_transcripts(transcripts_df(spark, n_convs=12, seed=42))
    stats = {r["tool"]: r for r in tool_retry_stats(ev).collect()}
    # Roles always present; tool names appear because ~10% of odd turns are
    # tool turns in the generator.
    assert "user" in stats and "assistant" in stats
    assert set(stats) <= {"user", "assistant", "search", "calculator",
                          "browser", "tool"}
    total_turns = sum(r["n_calls"] for r in stats.values())
    assert total_turns == ev.count()

    # user turns alternate with assistant/tool turns (generator parity
    # rule), so a 'user' turn can never retry a 'user' turn adjacently.
    assert stats["user"]["n_retries"] == 0

    pd = prefix_dedup(ev)
    rows = pd.collect()
    assert len(rows) == 12
    # Every conversation starts with a user turn -> depth-1 prefix 'user'
    # is shared by all 12.
    assert all(r["max_shared_depth"] >= 1 for r in rows)
    d1 = [r for r in rows if r["max_shared_depth"] == 1]
    for r in d1:
        assert r["n_sharers"] == 12


def test_adapter_ordering_matches_turn_idx(spark):
    t = spark.createDataFrame(
        [("c1", 1, "assistant", "hi", None, _TS),
         ("c1", 0, "user", "q", None, _TS),
         ("c1", 2, "tool", "r", "search", _TS)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    ev = events_from_transcripts(t).orderBy("event_id")
    types = [r["event_type"] for r in ev.collect()]
    assert types == ["user", "assistant", "search"]
    # (ep, event_id) must be a complete ordering key per conversation
    assert ev.select(F.countDistinct("event_id")).first()[0] == 3


def test_action_trie_profile_fanout(spark):
    from pdf_extractor_spark.operators.agent import action_trie_profile

    # 4 convs: all start 'a' (depth-1 diversity 1/4); two continue 'a,b',
    # one 'a,c', one stops -> depth-2: 3 active, 2 distinct prefixes.
    ev = _ev(spark, [
        (1, 0, 0, "a"), (1, 1, 1, "b"),
        (2, 0, 0, "a"), (2, 1, 1, "b"),
        (3, 0, 0, "a"), (3, 1, 1, "c"),
        (4, 0, 0, "a"),
    ])
    got = {r["d"]: r for r in action_trie_profile(ev).collect()}
    assert got[1]["n_active"] == 4 and got[1]["n_prefixes"] == 1
    assert got[1]["diversity_permille"] == 250
    assert got[2]["n_active"] == 3 and got[2]["n_prefixes"] == 2
    assert got[2]["diversity_permille"] == 666


def test_adjacent_dup_collapse_counts_runs(spark):
    from pdf_extractor_spark.operators.agent import adjacent_dup_collapse

    ev = spark.createDataFrame(
        [
            # user 1: x, x (dup), x (dup), y, x (NOT dup of y)
            (1, 0, 0, "x"), (1, 1, 10_000_000, "x"),
            (1, 2, 20_000_000, "x"), (1, 3, 30_000_000, "y"),
            (1, 4, 40_000_000, "x"),
            # user 2: same content but 400s apart -> outside window
            (2, 0, 0, "z"), (2, 1, 400_000_000, "z"),
        ],
        "user_id long, event_id long, ep long, content string",
    )
    got = {r["user_id"]: r for r in adjacent_dup_collapse(ev).collect()}
    assert got[1]["n_events"] == 5
    assert got[1]["n_collapsed"] == 2
    assert got[1]["n_kept"] == 3
    assert got[2]["n_collapsed"] == 0


def test_adjacent_dup_collapse_single_event_key(spark):
    # A key with exactly one event: lag is NULL, and the dup flag must
    # resolve to 0 (the oracle's CASE..ELSE 0), never NULL-propagate into
    # the rollup sums.
    from pdf_extractor_spark.operators.agent import adjacent_dup_collapse

    ev = spark.createDataFrame(
        [(1, 0, 0, "only")],
        "user_id long, event_id long, ep long, content string",
    )
    [row] = adjacent_dup_collapse(ev).collect()
    assert row["n_events"] == 1
    assert row["n_collapsed"] == 0
    assert row["n_kept"] == 1
