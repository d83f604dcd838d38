"""Agent data-card composition (plans/agent_report.py): sections present,
rollups consistent with the individual oracle-checked operators."""
from pdf_extractor_spark.operators.agent import (
    events_from_transcripts,
    tool_retry_stats,
)
from pdf_extractor_spark.plans.agent_report import agent_report
from pdf_extractor_spark.sources.transcripts import transcripts_df

N_CONVS = 12


def test_report_sections_and_consistency(spark):
    t = transcripts_df(spark, N_CONVS, seed=42)
    rows = agent_report(t).collect()
    by_sec: dict = {}
    for r in rows:
        by_sec.setdefault(r["section"], []).append(r)
    assert set(by_sec) == {
        "tool_retry", "tool_latency", "trie_profile",
        "prefix_dedup", "adjacent_dup",
    }

    # tool_retry totals equal the standalone operator's
    ev = events_from_transcripts(t)
    want = {r["tool"]: r for r in tool_retry_stats(ev).collect()}
    got_calls = {
        r["key"]: r["value"]
        for r in by_sec["tool_retry"]
        if r["metric"] == "n_calls"
    }
    assert got_calls == {k: v["n_calls"] for k, v in want.items()}

    # prefix rollup: every conv counted once; all convs share the depth-1
    # 'user' prefix so deepest_shared >= 1
    pd_vals = {r["metric"]: r["value"] for r in by_sec["prefix_dedup"]}
    assert pd_vals["n_convs"] == N_CONVS
    assert pd_vals["deepest_shared"] >= 1

    # adjacent_dup rollup: turn total equals the corpus size; generator
    # text is unique per turn so nothing collapses
    adj = {r["metric"]: r["value"] for r in by_sec["adjacent_dup"]}
    assert adj["n_turns"] == t.count()
    assert adj["n_collapsed"] == 0

    # trie profile covers depth 1..max and depth-1 diversity is 1 prefix
    d1 = [
        r for r in by_sec["trie_profile"]
        if r["key"] == "1" and r["metric"] == "n_prefixes"
    ]
    assert d1 and d1[0]["value"] == 1
