"""Sketch operators: HLL distinct estimate and Bloom semi-join pruning.

Pins (a) the md5-register arithmetic against an independent pure-Python
replay, (b) the Bloom filter's no-false-negative guarantee, and (c) the
integer-exact estimate math at query scale.
"""
import hashlib

import pyspark.sql.functions as F

from pdf_extractor_spark.operators import sketches


def _py_hll(keys):
    """Independent HLL replay: same spec, stdlib only."""
    regs = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        idx = int(h[:2], 16) % sketches.HLL_M
        w = int(h[2:10], 16)
        rho = 33 if w == 0 else 33 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    denom = sum(1 << (33 - r) for r in regs.values()) + (
        sketches.HLL_M - len(regs)
    ) * (1 << 33)
    return sketches.HLL_NUM // (sketches.HLL_DEN * denom), len(regs)


def test_hll_matches_python_replay(spark):
    keys = [f"user-{i}" for i in range(137)] * 3  # duplicates must not move it
    df = spark.createDataFrame(
        [("g", k) for k in keys], "grp string, k string"
    )
    row = sketches.hll_distinct(df, "grp", "k").collect()[0]
    est, n_regs = _py_hll(keys)
    assert row.hll_estimate == est
    assert row.n_registers == n_regs
    assert row.n_exact == 137


def test_hll_duplicate_invariance(spark):
    once = spark.createDataFrame(
        [("g", f"k{i}") for i in range(50)], "grp string, k string"
    )
    thrice = once.union(once).union(once)
    a = sketches.hll_distinct(once, "grp", "k").collect()[0]
    b = sketches.hll_distinct(thrice, "grp", "k").collect()[0]
    assert a.hll_estimate == b.hll_estimate
    assert a.n_registers == b.n_registers


def test_hll_reasonable_error(spark):
    """m=32 -> ~18% std error; assert a loose 3-sigma band (deterministic:
    this pins the current hash layout, not randomness)."""
    df = spark.createDataFrame(
        [("g", f"key-{i}") for i in range(400)], "grp string, k string"
    )
    row = sketches.hll_distinct(df, "grp", "k").collect()[0]
    assert row.err_permille <= 550


def test_bloom_no_false_negatives(spark):
    build = spark.createDataFrame(
        [(i,) for i in range(0, 300, 3)], "user_id long"
    )
    probe = spark.createDataFrame([(i,) for i in range(300)], "user_id long")
    words = sketches.bloom_words(build, "user_id")
    hits = sketches.bloom_probe(probe, words, "user_id")
    joined = hits.join(
        build.withColumn("m", F.lit(True)), "user_id", "left"
    )
    missed = joined.where(F.col("m") & ~F.col("bloom_hit")).count()
    assert missed == 0
    # and the filter actually prunes: most non-members rejected
    rejected = joined.where(F.col("m").isNull() & ~F.col("bloom_hit")).count()
    assert rejected > 150


def test_bloom_word_bounds(spark):
    build = spark.createDataFrame(
        [(i,) for i in range(500)], "user_id long"
    )
    words = sketches.bloom_words(build, "user_id").collect()
    assert len(words) <= sketches.BLOOM_BITS // sketches.BLOOM_WORD
    for w in words:
        assert 0 <= w.word_idx < sketches.BLOOM_BITS // sketches.BLOOM_WORD
        assert 0 <= w.word < (1 << sketches.BLOOM_WORD)


def test_bloom_query_summary(spark):
    row = sketches.q_bloom_semi_join(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.n_missed == 0  # Bloom filters never lose members
    assert row.n_bloom_hits >= row.n_members
    assert row.n_false_pos == row.n_bloom_hits - row.n_members


def test_cm_overestimates_only(spark):
    out = sketches.q_cm_sketch_words(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r.cm_cnt >= r.true_cnt       # the one-sided CM guarantee
        assert r.over_permille >= 0
    # the tight 3x16 matrix must show at least one genuine collision at
    # corpus scale, or the min-of-rows mechanism is untested
    assert any(r.cm_cnt > r.true_cnt for r in out)


def test_cm_matches_python_replay(spark):
    keys = ["alpha", "beta", "gamma", "alpha", "alpha", "beta"]
    df = spark.createDataFrame([(k,) for k in keys], "w string")
    got = {
        (r.row, r.pos): r.cnt
        for r in sketches.cm_counters(df, "w").collect()
    }
    want = {}
    for k in keys:
        for row in range(sketches.CM_D):
            h = hashlib.md5(f"cm{row}:{k}".encode()).hexdigest()
            pos = int(h[:8], 16) % sketches.CM_W
            want[(row, pos)] = want.get((row, pos), 0) + 1
    assert got == want


def test_hll_merge_equals_direct_union(spark):
    """max-merging per-group registers == sketching the union directly."""
    rows = [("a", f"u{i}") for i in range(80)] + [
        ("b", f"u{i}") for i in range(40, 140)
    ]
    df = spark.createDataFrame(rows, "grp string, k string")
    # direct: one group over the union
    direct = sketches.hll_distinct(
        df.select(F.lit("all").alias("grp"), "k"), "grp", "k"
    ).collect()[0]
    # merged: python max over per-group registers, same estimate formula
    est_a, _ = _py_hll([f"u{i}" for i in range(80)])
    union_est, _ = _py_hll({k for _, k in rows})
    assert direct.hll_estimate == union_est
    assert direct.n_exact == 140


def test_hist_percentiles_error_bounded(spark):
    out = sketches.q_hist_percentiles(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 15  # 5 event types x 3 percentiles
    for r in out:
        # the estimate is the covering bin's upper edge: one-sided error,
        # bounded by the bin width
        assert 0 <= r.err_cents < sketches.HIST_WIDTH
