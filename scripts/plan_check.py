"""Physical-plan invariant checker — the ".explain and iterate" gate.

Asserts the properties the engine's scale story depends on, so a regression
in plan shape fails loudly rather than silently costing a shuffle at 100 TB:

- no CartesianProduct / BroadcastNestedLoopJoin anywhere;
- parquet scans carry PushedFilters + pruned ReadSchema where expected;
- dimension joins broadcast (revenue_by_nation, knn_cosine, repair_coalesce);
- the extraction pipeline has exactly one Exchange (the per-conversation
  regroup) — no pre-shuffle before the map stage.

Usage: python scripts/plan_check.py [sf_dir]
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

FORBIDDEN_EVERYWHERE = ["CartesianProduct"]

# query -> (must_contain regexes, must_not_contain regexes)
RULES = {
    "pricing_summary": ([r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate",
                         r"ReadSchema: [^\n]*l_returnflag"], []),
    "revenue_by_nation": ([r"BroadcastHashJoin"], []),
    # Q3 shape: both fact-side date predicates must reach the scans and
    # the filtered customer side must broadcast
    "shipping_priority": ([r"BroadcastHashJoin",
                           r"PushedFilters: \[.*o_orderdate",
                           r"PushedFilters: \[.*l_shipdate"], []),
    # knn brute force is intentionally a broadcast nested-loop: the query
    # side is 10 rows, and every candidate must be scored against each.
    "knn_cosine": ([r"BroadcastNestedLoopJoin"], []),
    # margin mining's exact baseline broadcasts the source shard over the
    # target stream (same intentional BNLJ as knn; the scale path swaps in
    # the trained-IVF candidate join)
    "margin_mining": ([r"BroadcastNestedLoopJoin"], []),
    "ann_ivf_cosine": ([r"BroadcastHashJoin"], [r"BroadcastNestedLoopJoin"]),
    "repair_coalesce": ([r"BroadcastHashJoin.*LeftOuter|LeftOuter.*BroadcastHashJoin"], []),
    "dedup_exact": ([r"HashAggregate"], [r"SortMergeJoin"]),
    "dedup_minhash_lsh": ([], [r"SortMergeJoin", r"BroadcastHashJoin"]),
    "token_count": ([], [r"Exchange", r"BatchEvalPython", r"ArrowEvalPython"]),
    "normalize_text": ([], [r"Exchange", r"ArrowEvalPython"]),
    # the range predicate must ride an equi-join on (user_id, bucket) — an
    # NLJ here means the binning fell out of the join keys
    "range_join_binned": ([r"Join"], [r"BroadcastNestedLoopJoin"]),
    "length_quantiles": ([], [r"BroadcastNestedLoopJoin", r"ArrowEvalPython"]),
    # the cascade is a pure map: scan -> filter -> ONE Arrow UDF, no shuffle
    "lattice_stream_cascade": ([r"ArrowEvalPython"], [r"Exchange"]),
    "token_windows": ([], [r"Exchange", r"ArrowEvalPython"]),
    # pure per-row transforms: a shuffle or Python node appearing here
    # means the map decomposed wrongly
    "fim_transform": ([], [r"Exchange", r"ArrowEvalPython"]),
    "unicode_anomalies": ([], [r"Exchange", r"ArrowEvalPython"]),
    # round-3 curation ops: thresholds/offsets must ride broadcast joins;
    # the repetition rollup must stay pure hash aggregation (no windows)
    "mixture_resample": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    "repetition_filters": ([], [r"\bWindow\b", r"ArrowEvalPython"]),
    "token_packing": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    "sequence_manifest": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    # epoch shuffle: bucket offsets ride a broadcast join; the per-bucket
    # rank must never fall back to a sort-merge join or a Python stage
    "sequence_shuffle": ([r"BroadcastHashJoin"], [r"SortMergeJoin", r"ArrowEvalPython"]),
    "paragraph_dedup": ([], [r"ArrowEvalPython"]),
    # the trigram model and the bench shingle set are bounded -> broadcast
    "lm_fluency": ([r"BroadcastHashJoin"], [r"SortMergeJoin", r"ArrowEvalPython"]),
    "decontaminate_spans": ([r"BroadcastHashJoin"], [r"ArrowEvalPython"]),
    # CDC is a per-row map + digest-keyed aggregation: no windows, no Python
    "cdc_chunk_dedup": ([], [r"\bWindow\b", r"ArrowEvalPython"]),
    # host stats are bounded by distinct hosts -> broadcast back; the keep
    # decision is a pure integer map (no windows, no Python)
    "url_host_filter": ([r"BroadcastHashJoin"], [r"SortMergeJoin", r"\bWindow\b", r"ArrowEvalPython"]),
    # DSIR: bucket weights are DSIR_BUCKETS-bounded -> broadcast onto the
    # gram stream; selection is windowless integer arithmetic
    "dsir_select": ([r"BroadcastHashJoin"], [r"SortMergeJoin", r"\bWindow\b", r"ArrowEvalPython"]),
    # PQ encode is a pure map after the fit (1-row broadcast codebook);
    # ADC recall must keep the salted two-stage shortlist + broadcast LUTs
    "pq_codes": ([], [r"SortMergeJoin", r"\bWindow\b", r"ArrowEvalPython"]),
    "pq_adc_recall": ([r"BroadcastHashJoin", r"pmod"], [r"SortMergeJoin", r"ArrowEvalPython"]),
    "ann_ivfpq_recall": ([r"BroadcastHashJoin", r"pmod"], [r"SortMergeJoin", r"ArrowEvalPython"]),
    # sketches: the HLL register frame is a pure two-level hash aggregate
    # (no windows, no Python); the Bloom word table (<= 64 rows) must ride
    # a broadcast join on the probe side
    "hll_distinct": ([r"HashAggregate"], [r"\bWindow\b", r"ArrowEvalPython", r"SortMergeJoin"]),
    # pagerank: every iteration is equi-keyed joins + hash aggregation;
    # a window or NLJ in the plan means the rank update lost its keys
    "pagerank": ([], [r"\bWindow\b", r"ArrowEvalPython", r"BroadcastNestedLoopJoin"]),
    # asof: one tagged union + one per-key window pass — a second Window
    # or any join means the construction degraded to a range search
    "asof_join_events": ([r"\bWindow\b"], [r"Join", r"ArrowEvalPython"]),
    # rollup: two pure hash aggregations (partial -> merge), nothing else
    "rollup_two_level": ([r"HashAggregate"], [r"\bWindow\b", r"Join", r"ArrowEvalPython"]),
    # logreg: the 65-row weight frame must broadcast onto the features;
    # the gradient/logit path is pure keyed aggregation. (The intentional
    # 1-row metrics crossJoin IS a broadcast NLJ, so no NLJ ban here.)
    "logreg_quality": ([r"BroadcastHashJoin"], [r"\bWindow\b", r"ArrowEvalPython"]),
    "bloom_semi_join": ([r"BroadcastHashJoin"], [r"\bWindow\b", r"ArrowEvalPython", r"BroadcastNestedLoopJoin"]),
    # count-min: the d*w counter matrix is constant-size -> broadcast probe
    "cm_sketch_words": ([r"BroadcastHashJoin"], [r"\bWindow\b", r"ArrowEvalPython", r"SortMergeJoin"]),
    "hll_merge": ([r"HashAggregate"], [r"\bWindow\b", r"ArrowEvalPython", r"SortMergeJoin"]),
    # zorder: pure map (the Morton code) + per-file hash aggregates; the
    # verdicts combine via bounded broadcast cross joins
    "zorder_skipping": ([r"HashAggregate"], [r"\bWindow\b", r"ArrowEvalPython", r"SortMergeJoin"]),
    # triangles: degree-oriented wedge join — equi-keyed throughout
    "triangle_count": ([], [r"\bWindow\b", r"ArrowEvalPython"]),
    # ppjoin: candidate join is keyed on PREFIX tokens; the only window is
    # the doc-keyed prefix rank (bounded by doc length) — never an NLJ
    "ppjoin_similar": ([r"\bWindow\b"], [r"ArrowEvalPython", r"BroadcastNestedLoopJoin"]),
    # scd2: per-user windows only, no joins at all
    "scd2_user_tiers": ([r"\bWindow\b"], [r"Join", r"ArrowEvalPython"]),
    # purge: the deletion list must broadcast (anti/semi) — the big side
    # never shuffles
    "purge_users": ([r"BroadcastHashJoin"], [r"SortMergeJoin", r"ArrowEvalPython", r"\bWindow\b"]),
    # OLAP surface: pivot is ONE hash aggregate (explicit value list — no
    # inference scan, no join); rollup levels expand inside one aggregate
    # over broadcast dim joins; ntile/range windows are user-partitioned
    # (never a global-order window) and join-free
    "pivot_weekday": ([r"HashAggregate"], [r"Join", r"\bWindow\b", r"ArrowEvalPython"]),
    "rollup_region_nation": ([r"BroadcastHashJoin", r"Expand"], [r"SortMergeJoin", r"\bWindow\b", r"ArrowEvalPython"]),
    "user_value_quartiles": ([r"\bWindow\b"], [r"Join", r"ArrowEvalPython"]),
    "rolling_week_spend": ([r"\bWindow\b"], [r"Join", r"ArrowEvalPython"]),
    # melt/grouping-sets ride one Expand + one aggregate, join-free;
    # session windows are user-partitioned (never a global sort)
    "unpivot_weekday": ([r"Expand"], [r"Join", r"\bWindow\b", r"ArrowEvalPython"]),
    "grouping_sets_activity": ([r"Expand"], [r"Join", r"\bWindow\b", r"ArrowEvalPython"]),
    "session_window_agg": ([], [r"Join", r"ArrowEvalPython"]),
    "cube_type_weekday": ([r"Expand"], [r"Join", r"\bWindow\b", r"ArrowEvalPython"]),
    # moments side is one row per type -> must broadcast; both aggregates
    # hash-based, no windows, no Python
    "outlier_zscore": ([r"BroadcastHashJoin"], [r"SortMergeJoin", r"\bWindow\b", r"ArrowEvalPython"]),
    # transition totals broadcast back onto the pair counts
    "markov_transitions": ([r"BroadcastHashJoin", r"\bWindow\b"], [r"SortMergeJoin", r"ArrowEvalPython"]),
    # the spine/fill window runs over the calendar-bounded spine, never
    # the raw corpus; no Python anywhere
    "hourly_spine_ffill": ([r"\bWindow\b"], [r"ArrowEvalPython"]),
    # trigram mining: per-user lag windows + one hash aggregate, join-free
    "sequential_patterns": ([r"\bWindow\b", r"HashAggregate"],
                            [r"Join", r"ArrowEvalPython"]),
    # hard negatives: the label filter must RIDE the bucket equi-join —
    # an NLJ here means the predicate displaced the equi-key
    "hard_negatives": ([r"BroadcastHashJoin"],
                       [r"BroadcastNestedLoopJoin", r"SortMergeJoin",
                        r"ArrowEvalPython"]),
    # triplets: same candidate shape as hard_negatives
    "training_triplets": ([r"BroadcastHashJoin"],
                          [r"BroadcastNestedLoopJoin", r"SortMergeJoin",
                           r"ArrowEvalPython"]),
    # fusion operates on the two bounded top-K lists; the corpus-sized
    # work stays inside each system (their own salted two-stage ranks)
    "rrf_fusion": ([r"pmod"], [r"SortMergeJoin", r"ArrowEvalPython"]),
    # per-user window + hash aggregate, join-free (the sessionize layout)
    "time_weighted_avg": ([r"\bWindow\b", r"HashAggregate"],
                          [r"Join", r"ArrowEvalPython"]),
    "purchase_attribution": ([r"\bWindow\b", r"HashAggregate"],
                             [r"Join", r"ArrowEvalPython"]),
    # step chaining is user-keyed equi-joins + hash aggregates; the only
    # NLJ is the intentional 1-row count combine (logreg pattern)
    "funnel_steps": ([r"HashAggregate"],
                     [r"\bWindow\b", r"ArrowEvalPython"]),
    # df joins back on the TERM key; the per-doc rank window is bounded
    # by a doc's distinct terms. (The intentional 1-row n_docs crossJoin
    # IS a broadcast NLJ — the logreg pattern — so no NLJ ban here.)
    "doc_keywords": ([r"\bWindow\b"], [r"ArrowEvalPython"]),
    # the K-row result list must broadcast onto the documents scan
    "search_snippets": ([r"BroadcastHashJoin"],
                        [r"SortMergeJoin", r"ArrowEvalPython"]),
    # pair generation is a shifted-slice MAP (never a positional
    # self-join); the global top-K must keep the salted two-stage shape
    "cooccurrence_pmi": ([r"pmod"], [r"ArrowEvalPython"]),
    # SemDeDup: the block-count and dropped-id joins are keyed broadcasts;
    # pair generation is groupBy+collect_list (no self-join, no window)
    "semantic_dedup": ([r"BroadcastHashJoin"],
                       [r"SortMergeJoin", r"\bWindow\b", r"ArrowEvalPython"]),
    # anchor aggregation: the rank window runs over the PRE-AGGREGATED
    # (target, anchor) counts. (The 1-row n_docs crossJoin IS a broadcast
    # NLJ — the logreg pattern — so no NLJ ban.)
    "anchor_text_agg": ([r"\bWindow\b", r"HashAggregate"],
                        [r"ArrowEvalPython"]),
    # CDC: ONE full-outer key-equi join + a digest-compare map
    "snapshot_diff": ([r"FullOuter"],
                      [r"\bWindow\b", r"ArrowEvalPython",
                       r"BroadcastNestedLoopJoin"]),
    # compaction: per-partition running-sum window + one aggregate, no joins
    "compaction_plan": ([r"\bWindow\b", r"HashAggregate"],
                        [r"Join", r"ArrowEvalPython"]),
    # k-anonymity: one hash aggregate over the quasi-id tuple, nothing else
    "k_anonymity": ([r"HashAggregate"],
                    [r"Join", r"\bWindow\b", r"ArrowEvalPython"]),
    # lift: keyed counts + term-keyed join-back; source totals broadcast.
    # (The 1-row corpus-total crossJoin IS a broadcast NLJ — logreg pattern.)
    "source_term_lift": ([r"HashAggregate", r"BroadcastHashJoin"],
                         [r"\bWindow\b", r"ArrowEvalPython"]),
    # Deequ pair: one aggregate pass + broadcast anti-join RI check; the
    # 1-row totals crossJoins are broadcast NLJs (allowed, logreg pattern).
    "expectation_suite": ([r"HashAggregate", r"BroadcastHashJoin"],
                          [r"SortMergeJoin", r"ArrowEvalPython"]),
    # RFM: 9 boundary values broadcast back; scoring is a comparison map.
    "rfm_features": ([r"BroadcastHashJoin"],
                     [r"SortMergeJoin", r"ArrowEvalPython"]),
    # backfill planner: spine anti-join + gap-run window, dims broadcast.
    "coverage_gaps": ([r"BroadcastHashJoin", r"\bWindow\b"],
                      [r"SortMergeJoin", r"ArrowEvalPython"]),
    # planner arithmetic: count frames only — the fact tables never meet
    # row-to-row (no SMJ pinned: at scale the key-frame join MAY sort-merge,
    # which is correct; what matters is aggregates-before-join).
    "join_cardinality_estimate": ([r"HashAggregate"], [r"ArrowEvalPython"]),
    "ab_uplift": ([r"HashAggregate"],
                  [r"SortMergeJoin", r"ArrowEvalPython"]),
}

# Ops built on the salted two-stage top-K: exactly two Window nodes (the
# salted partial rank + the small final rank) and a pmod salt in the plan —
# one Window would be a single/few-task global sort at 100 TB.
TWO_STAGE_RANK = ["vocab_top_ngrams", "inverted_index", "stratified_sample",
                  "cluster_top_terms", "bm25_top_k", "shipping_priority",
                  "join_key_skew_profile",
                  # the skyline distributes like top-K: salted local front
                  # (window 1) + final front over survivors (window 2)
                  "pareto_front", "decayed_leaderboard"]


def plan_of(df) -> str:
    """Physical plan, formatted (for regex checks on node details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_tree(df) -> str:
    """Physical plan, simple tree (each node appears exactly once — use for
    node counting; the formatted mode lists every node twice)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod
    from pdf_extractor_spark.plans.pipeline import run_pipeline
    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.sources.transcripts import transcripts_df

    spark = get_spark(app_name="plan-check", master="local[4]",
                      shuffle_partitions=8)
    failures = []
    queries = entry_mod.queries()

    for name, (must, must_not) in RULES.items():
        plan = plan_of(queries[name](spark, sf_dir))
        for pat in FORBIDDEN_EVERYWHERE + must_not:
            if re.search(pat, plan, re.DOTALL):
                failures.append(f"{name}: forbidden pattern {pat!r} in plan")
        for pat in must:
            if not re.search(pat, plan, re.DOTALL):
                failures.append(f"{name}: required pattern {pat!r} missing")
        print(f"checked {name}")

    for name in TWO_STAGE_RANK:
        df = queries[name](spark, sf_dir)
        n_windows = len(re.findall(r"\bWindow\b", plan_tree(df)))
        if n_windows != 2:
            failures.append(
                f"{name}: expected 2 Window nodes (salted partial rank + "
                f"final rank), found {n_windows}"
            )
        if not re.search(r"pmod", plan_of(df)):
            failures.append(
                f"{name}: salted partial rank missing (no pmod in plan)"
            )
        print(f"checked {name} (windows={n_windows}, salted)")

    # Pipeline shape: exactly one Exchange (assembly regroup), one Arrow UDF
    # node (the kernel is evaluated once however many columns reference it),
    # scan-native partitioning before the map. Input comes from parquet so
    # the generator's own repartition does not appear in the plan.
    corpus = "/tmp/plan_check_corpus"
    transcripts_df(spark, 8, seed=1).write.mode("overwrite").parquet(corpus)
    pipe_plan = plan_tree(run_pipeline(spark.read.parquet(corpus)))
    n_exchange = len(re.findall(r"\bExchange\b", pipe_plan))
    n_arrow = len(re.findall(r"ArrowEvalPython", pipe_plan))
    if n_exchange != 1:
        failures.append(f"pipeline: expected 1 Exchange, found {n_exchange}")
    if n_arrow != 1:
        failures.append(f"pipeline: expected 1 ArrowEvalPython, found {n_arrow}")
    for pat in FORBIDDEN_EVERYWHERE:
        if re.search(pat, pipe_plan):
            failures.append(f"pipeline: forbidden {pat!r}")
    print("checked extraction pipeline "
          f"(exchanges={n_exchange}, arrow_nodes={n_arrow})")

    spark.stop()
    if failures:
        print("\nPLAN CHECK FAILURES:")
        for f in failures:
            print(" -", f)
        return 1
    print("\nALL PLAN INVARIANTS HOLD")
    return 0


if __name__ == "__main__":
    sys.exit(main())
