"""Distributed sketches: HyperLogLog distinct-count and Bloom-filter
semi-join pruning — engine-portable (md5-derived hashing, pure integer
arithmetic) so the driver's DuckDB oracle replays them bit-for-bit.

Why sketches at 100 TB: an exact ``count(DISTINCT ...)`` shuffles every
distinct key; the HLL register frame shuffles AT MOST ``m`` rows per group
after map-side partial max — constant, not data-sized. A Bloom filter built
from a small build side and broadcast lets the fact scan drop non-matching
rows BEFORE the join shuffle (Spark's own runtime row-level filters /
``bloom_filter_agg`` are the JVM twins; this one is cross-engine replayable
so its false-positive rate is *measured*, not assumed — the same
honest-metrics pattern as ``ann_recall``).

Determinism: hashes come from md5 hex prefixes (the repo-wide idiom, see
operators/text_ops.py holdout buckets); estimates use only integer
shifts/divides — the HLL alpha constant is carried as an exact rational
(7213·m / (10·(1000·m + 1079))) and applied by cross-multiplied integer
floor division, so Spark and DuckDB produce identical estimates. The
small-range (linear-counting) correction needs ln(); production applies it
driver-side on the returned register stats — the raw estimate plus the
measured error against the exact count is what this query reports.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# ---- HyperLogLog ----------------------------------------------------------
HLL_M = 32  # registers (p=5); std err ~ 1.04/sqrt(m) ~ 18%
_MAXR = 33  # rho of a zero 32-bit suffix (all bits zero -> 32 zeros + 1)
# floor(alpha_m * m^2 * 2^MAXR / denom) via integer cross-multiply:
# alpha_m = 0.7213/(1 + 1.079/m) = 7213*m / (10*(1000*m + 1079))
HLL_NUM = 7213 * HLL_M**3 * (1 << _MAXR)  # 2.03e18 — fits BIGINT
HLL_DEN = 10 * (1000 * HLL_M + 1079)

# ---- Bloom filter ---------------------------------------------------------
BLOOM_BITS = 2048
BLOOM_WORD = 32  # bits per word -> shifts never touch the sign bit
BLOOM_K = 3  # hash functions
BLOOM_VALUE_MIN = 200  # build set: purchasers with value > this


def _hex_long(col: F.Column, start: int, length: int) -> F.Column:
    """First ``length`` hex chars of md5(col) from ``start`` (1-based) as a
    non-negative bigint — identical to DuckDB ('0x'||substr(md5))::BIGINT."""
    return F.conv(F.substring(F.md5(col), start, length), 16, 10).cast("long")


def hll_registers(df: DataFrame, key_col: str, *group_cols: str) -> DataFrame:
    """The HLL register frame: (*group_cols, idx, r) with r = max rho per
    register. This is the ONE construction of the sketch arithmetic —
    estimation (:func:`_hll_estimate`) and merging (max per idx over any
    union of register frames, see q_hll_merge) both consume it, so a fix
    to the hash/rho math lands everywhere at once. Map-side combined;
    <= m rows per group cross the shuffle regardless of input size."""
    h = F.col(key_col).cast("string")
    hashed = df.select(
        *[F.col(c) for c in group_cols],
        F.pmod(_hex_long(h, 1, 2), F.lit(HLL_M)).alias("idx"),
        _hex_long(h, 3, 8).alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(_MAXR)).otherwise(
            F.lit(_MAXR) - F.length(F.bin(F.col("w")))
        ),
    )
    return hashed.groupBy(*group_cols, "idx").agg(F.max("rho").alias("r"))


def _hll_estimate(regs: DataFrame, *group_cols: str) -> DataFrame:
    """Registers -> (*group_cols, n_registers, hll_estimate): absent
    registers contribute the full 2^_MAXR denominator term; the estimate
    is the exact integer ratio both engines reproduce bit-for-bit."""
    g = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_registers"),
        F.sum(F.expr(f"shiftleft(1L, {_MAXR} - r)")).alias("denom_present"),
    )
    denom = F.col("denom_present") + (
        (F.lit(HLL_M) - F.col("n_registers"))
        * F.lit(1 << _MAXR).cast("long")
    )
    return (
        g.withColumn("__denom", denom)
        .withColumn(
            "hll_estimate", F.expr(f"div({HLL_NUM}, {HLL_DEN} * __denom)")
        )
        .drop("denom_present", "__denom")
    )


def _err_permille() -> F.Column:
    # a function, not a module constant: F.expr needs a live SparkContext
    return F.expr(
        "div(abs(hll_estimate - n_exact) * 1000, n_exact)"
    ).alias("err_permille")


def hll_distinct(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per ``group_col``: HLL registers -> raw estimate, beside the exact
    distinct count and the integer-permille error. The exact count (error
    measurement only) is the expensive operator the sketch replaces at
    100 TB."""
    per_group = _hll_estimate(
        hll_registers(df, key_col, group_col), group_col
    )
    exact = df.groupBy(group_col).agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    return per_group.join(exact, group_col).select(
        group_col, "n_exact", "n_registers", "hll_estimate", _err_permille()
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, sketched vs exact."""
    from . import load

    return hll_distinct(
        load(spark, sf_dir, "events"), "event_type", "user_id"
    )


def _bloom_pos(key: F.Column, seed: int) -> F.Column:
    return F.pmod(
        _hex_long(F.concat(F.lit(f"{seed}:"), key.cast("string")), 1, 8),
        F.lit(BLOOM_BITS),
    )


def bloom_words(build_keys: DataFrame, key_col: str) -> DataFrame:
    """(word_idx, word) bit-array of the build keys — <= BITS/WORD rows,
    always broadcastable; the collect-free relational form of a broadcast
    Bloom variable."""
    pos = build_keys.select(
        F.explode(
            F.array(
                *[_bloom_pos(F.col(key_col), s) for s in range(BLOOM_K)]
            )
        ).alias("pos")
    )
    return pos.select(
        F.shiftright(F.col("pos"), 5).alias("word_idx"),
        F.expr(f"shiftleft(1L, pmod(pos, {BLOOM_WORD}))").alias("mask"),
    ).groupBy("word_idx").agg(F.bit_or("mask").alias("word"))


def bloom_probe(
    probe_keys: DataFrame, words: DataFrame, key_col: str
) -> DataFrame:
    """Per probe key: does the Bloom filter claim membership? All k
    positions must be set. The words side is broadcast (bounded by
    BITS/WORD); a probe key's k rows regroup on the key itself."""
    probed = probe_keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[_bloom_pos(F.col(key_col), s) for s in range(BLOOM_K)]
            )
        ).alias("pos"),
    ).select(
        key_col,
        F.shiftright(F.col("pos"), 5).alias("word_idx"),
        F.expr(f"shiftleft(1L, pmod(pos, {BLOOM_WORD}))").alias("mask"),
    )
    hit = (
        F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask"))
        == F.col("mask")
    )
    return (
        probed.join(F.broadcast(words), "word_idx", "left")
        .withColumn("bit_set", hit)
        .groupBy(key_col)
        .agg(F.bool_and("bit_set").alias("bloom_hit"))
    )


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join pruning with a measured false-positive rate.

    Build side: high-value purchasers (small dim). Probe side: distinct
    clicking users (the fact side's key column). In production the probe
    runs inside the fact scan as a pre-shuffle filter — rows whose key the
    Bloom rejects never enter the join exchange; the reported
    ``fpr_permille`` is the measured fraction of non-members that survive
    anyway (wasted shuffle bound). One summary row, all integers.
    """
    from . import load

    ev = load(spark, sf_dir, "events")
    build = (
        ev.where(
            (F.col("event_type") == "purchase")
            & (F.col("value") > BLOOM_VALUE_MIN)
        )
        .select("user_id")
        .distinct()
    )
    probe = (
        ev.where(F.col("event_type") == "click").select("user_id").distinct()
    )
    words = bloom_words(build, "user_id")
    hits = bloom_probe(probe, words, "user_id")
    flagged = hits.join(
        build.withColumn("is_member", F.lit(True)), "user_id", "left"
    ).select(
        "user_id",
        "bloom_hit",
        F.coalesce("is_member", F.lit(False)).alias("is_member"),
    )
    return flagged.agg(
        F.count("*").alias("n_probe_users"),
        F.sum(F.col("is_member").cast("long")).alias("n_members"),
        F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom_hits"),
        F.sum(
            (F.col("bloom_hit") & ~F.col("is_member")).cast("long")
        ).alias("n_false_pos"),
        F.sum(
            (~F.col("bloom_hit") & F.col("is_member")).cast("long")
        ).alias("n_missed"),
    ).select(
        "n_probe_users",
        "n_members",
        "n_bloom_hits",
        "n_false_pos",
        "n_missed",
        F.expr(
            "CASE WHEN n_probe_users > n_members THEN "
            "div(n_false_pos * 1000, n_probe_users - n_members) "
            "ELSE 0 END"
        ).alias("fpr_permille"),
    )


QUERIES = {
    "hll_distinct": q_hll_distinct,
    "bloom_semi_join": q_bloom_semi_join,
}

_HLL_HASH = (
    "('0x' || substring(md5(user_id::VARCHAR), {s}, {n}))::BIGINT"
)

ORACLES = {
    "hll_distinct": f"""
        WITH h AS (
            SELECT event_type,
                   {_HLL_HASH.format(s=1, n=2)} % {HLL_M} AS idx,
                   {_HLL_HASH.format(s=3, n=8)} AS w
            FROM events
        ), r AS (
            SELECT event_type, idx,
                   max(CASE WHEN w = 0 THEN {_MAXR}
                            ELSE {_MAXR} - length(bin(w)) END) AS r
            FROM h GROUP BY event_type, idx
        ), g AS (
            SELECT event_type,
                   count(*) AS n_registers,
                   sum(1::BIGINT << ({_MAXR} - r))::BIGINT
                       + ({HLL_M} - count(*)) * {1 << _MAXR}::BIGINT
                       AS denom
            FROM r GROUP BY event_type
        ), e AS (
            SELECT event_type, count(DISTINCT user_id) AS n_exact
            FROM events GROUP BY event_type
        )
        SELECT g.event_type, e.n_exact, g.n_registers,
               {HLL_NUM}::BIGINT // ({HLL_DEN}::BIGINT * denom)
                   AS hll_estimate,
               abs({HLL_NUM}::BIGINT // ({HLL_DEN}::BIGINT * denom)
                   - e.n_exact) * 1000 // e.n_exact AS err_permille
        FROM g JOIN e USING (event_type)
    """,
    "bloom_semi_join": f"""
        WITH build AS (
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase' AND value > {BLOOM_VALUE_MIN}
        ), probe AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        ), seeds AS (SELECT unnest(range({BLOOM_K})) AS s),
        bpos AS (
            SELECT ('0x' || substring(
                       md5(s::VARCHAR || ':' || user_id::VARCHAR), 1, 8
                   ))::BIGINT % {BLOOM_BITS} AS pos
            FROM build, seeds
        ), words AS (
            SELECT pos >> 5 AS word_idx,
                   bit_or(1::BIGINT << (pos % {BLOOM_WORD})) AS word
            FROM bpos GROUP BY pos >> 5
        ), ppos AS (
            SELECT user_id,
                   ('0x' || substring(
                       md5(s::VARCHAR || ':' || user_id::VARCHAR), 1, 8
                   ))::BIGINT % {BLOOM_BITS} AS pos
            FROM probe, seeds
        ), checked AS (
            SELECT user_id,
                   bool_and(
                       (coalesce(word, 0) & (1::BIGINT << (pos % {BLOOM_WORD})))
                       = (1::BIGINT << (pos % {BLOOM_WORD}))
                   ) AS bloom_hit
            FROM ppos LEFT JOIN words ON ppos.pos >> 5 = words.word_idx
            GROUP BY user_id
        ), flagged AS (
            SELECT c.user_id, c.bloom_hit,
                   (b.user_id IS NOT NULL) AS is_member
            FROM checked c LEFT JOIN build b USING (user_id)
        )
        SELECT count(*) AS n_probe_users,
               sum(is_member::BIGINT)::BIGINT AS n_members,
               sum(bloom_hit::BIGINT)::BIGINT AS n_bloom_hits,
               sum((bloom_hit AND NOT is_member)::BIGINT)::BIGINT
                   AS n_false_pos,
               sum((NOT bloom_hit AND is_member)::BIGINT)::BIGINT
                   AS n_missed,
               (CASE WHEN count(*) > sum(is_member::BIGINT) THEN
                   sum((bloom_hit AND NOT is_member)::BIGINT) * 1000
                   // (count(*) - sum(is_member::BIGINT))
               ELSE 0 END)::BIGINT AS fpr_permille
        FROM flagged
    """,
}


# ---------------------------------------------------------------------------
# Count-min sketch: frequency estimation in sublinear state — the third
# sketch beside HLL (cardinality) and Bloom (membership). d hash rows of w
# counters; a key's estimate is the MIN over its d counters, so collisions
# only ever OVER-estimate. The honest metric here is that overestimate,
# measured per key against the exact count.
# ---------------------------------------------------------------------------
CM_D = 3   # hash rows
CM_W = 16  # counters per row — deliberately tight so collisions happen
           # at test scale and the min-of-rows mechanism has real work


def _cm_pos(key: F.Column, row: int) -> F.Column:
    return F.pmod(
        _hex_long(F.concat(F.lit(f"cm{row}:"), key.cast("string")), 1, 8),
        F.lit(CM_W),
    )


def cm_counters(items: DataFrame, key_col: str) -> DataFrame:
    """(row, pos, cnt): the d x w counter matrix as rows — built by ONE
    explode + hash-groupBy with map-side combine; the matrix is bounded by
    d*w regardless of input size, so it always broadcasts back."""
    return (
        items.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            _cm_pos(F.col(key_col), r).alias("pos"),
                        )
                        for r in range(CM_D)
                    ]
                )
            ).alias("rp")
        )
        .select("rp.row", "rp.pos")
        .groupBy("row", "pos")
        .agg(F.count("*").alias("cnt"))
    )


def q_cm_sketch_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency estimates from a 3x16 count-min sketch vs exact
    counts: per distinct word, the true count, the CM estimate (provably
    >= true), and the integer-permille overestimate.

    Scale shape: sketch build is one map-side-combined groupBy onto d*w
    cells (constant state — the reason to sketch at 100 TB instead of
    counting 10^9 distinct grams); the probe joins each key's d cells
    against the broadcast counter matrix and takes the min."""
    from . import load

    words = load(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).alias("w")
    )
    counters = cm_counters(words, "w")
    exact = words.groupBy("w").agg(F.count("*").alias("true_cnt"))
    probes = exact.select(
        "w",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_pos(F.col("w"), r).alias("pos"),
                    )
                    for r in range(CM_D)
                ]
            )
        ).alias("rp"),
    ).select("w", "true_cnt", "rp.row", "rp.pos")
    est = (
        probes.join(F.broadcast(counters), ["row", "pos"])
        .groupBy("w", "true_cnt")
        .agg(F.min("cnt").alias("cm_cnt"))
    )
    return est.select(
        "w",
        "true_cnt",
        "cm_cnt",
        F.expr(
            "div((cm_cnt - true_cnt) * 1000, true_cnt)"
        ).alias("over_permille"),
    )


def hll_merge(register_frames: list, group_cols: list) -> DataFrame:
    """Merge HLL sketches: union the register frames and take max() per
    aligned register. This is why the register frame (not the estimate)
    is the thing a 100 TB pipeline persists per partition/day: any union
    of groups collapses to one more tiny max-aggregate."""
    from functools import reduce

    unioned = reduce(DataFrame.unionByName, register_frames)
    return unioned.groupBy(*group_cols, "idx").agg(F.max("r").alias("r"))


def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL MERGEABILITY property, measured: per-event-type register
    frames are merged (max per register index) into one global sketch,
    whose estimate is compared against the exact global distinct count.
    Identical to sketching the union directly — the algebraic fact that
    makes HLL the standard per-partition/per-day persisted artifact.
    Built entirely from the shared register/estimate helpers — no second
    copy of the sketch arithmetic exists."""
    from . import load

    ev = load(spark, sf_dir, "events")
    per_type = hll_registers(ev, "user_id", "event_type")
    merged = hll_merge([per_type.drop("event_type")], group_cols=[])
    g = _hll_estimate(merged)
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return g.crossJoin(F.broadcast(exact)).select(
        "n_exact", "n_registers", "hll_estimate", _err_permille()
    )


QUERIES["cm_sketch_words"] = q_cm_sketch_words
QUERIES["hll_merge"] = q_hll_merge

ORACLES["cm_sketch_words"] = f"""
    WITH words AS (
        SELECT unnest(list_filter(
                   regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS w
        FROM documents
    ), rows_ AS (SELECT unnest(range({CM_D})) AS row),
    cells AS (
        SELECT row,
               ('0x' || substring(md5('cm' || row::VARCHAR || ':' || w),
                                  1, 8))::BIGINT % {CM_W} AS pos
        FROM words, rows_
    ), counters AS (
        SELECT row, pos, count(*) AS cnt FROM cells GROUP BY row, pos
    ), exact AS (
        SELECT w, count(*) AS true_cnt FROM words GROUP BY w
    ), probes AS (
        SELECT w, true_cnt, row,
               ('0x' || substring(md5('cm' || row::VARCHAR || ':' || w),
                                  1, 8))::BIGINT % {CM_W} AS pos
        FROM exact, rows_
    )
    SELECT w, true_cnt, min(cnt) AS cm_cnt,
           (min(cnt) - true_cnt) * 1000 // true_cnt AS over_permille
    FROM probes JOIN counters USING (row, pos)
    GROUP BY w, true_cnt
"""

ORACLES["hll_merge"] = f"""
    WITH h AS (
        SELECT event_type,
               {_HLL_HASH.format(s=1, n=2)} % {HLL_M} AS idx,
               {_HLL_HASH.format(s=3, n=8)} AS w
        FROM events
    ), per_type AS (
        SELECT event_type, idx,
               max(CASE WHEN w = 0 THEN {_MAXR}
                        ELSE {_MAXR} - length(bin(w)) END) AS r
        FROM h GROUP BY event_type, idx
    ), merged AS (
        SELECT idx, max(r) AS r FROM per_type GROUP BY idx
    ), g AS (
        SELECT count(*) AS n_registers,
               sum(1::BIGINT << ({_MAXR} - r))::BIGINT
                   + ({HLL_M} - count(*)) * {1 << _MAXR}::BIGINT AS denom
        FROM merged
    ), e AS (SELECT count(DISTINCT user_id) AS n_exact FROM events)
    SELECT e.n_exact, g.n_registers,
           {HLL_NUM}::BIGINT // ({HLL_DEN}::BIGINT * denom) AS hll_estimate,
           abs({HLL_NUM}::BIGINT // ({HLL_DEN}::BIGINT * denom) - e.n_exact)
               * 1000 // e.n_exact AS err_permille
    FROM g, e
"""


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram + percentile estimation: the fourth sketch.
# An exact per-group percentile needs a per-group SORT of every value; the
# histogram needs one hash-groupBy onto (group, bin) — bounded state, and
# two histograms merge by adding bin counts (the same algebra as the
# hourly-partial rollup). The estimate is the covering bin's UPPER edge, so
# the error is one-sided and bounded by the bin width — measured here per
# percentile against the exact nearest-rank value (honest metrics).
# ---------------------------------------------------------------------------
HIST_BINS = 64
HIST_WIDTH = 800          # cents per bin; 64*800 covers value <= 512.00
HIST_PCTS = [50, 90, 99]


def q_hist_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, percentile): the histogram estimate vs the exact
    nearest-rank value, with the one-sided error in cents."""
    from pyspark.sql import Window
    from . import load

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    binned = ev.select(
        "event_type",
        F.least(
            F.expr(f"div(c, {HIST_WIDTH})"), F.lit(HIST_BINS - 1)
        ).alias("bin"),
    ).groupBy("event_type", "bin").agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = binned.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wtot)
    )
    # estimate per percentile: upper edge of the first bin whose cumulative
    # count reaches rank = ceil(p*n/100)
    est_rows = []
    for p in HIST_PCTS:
        est_rows.append(
            cum.where(
                F.col("cum") >= F.expr(f"(n * {p} + 99) div 100")
            )
            .groupBy("event_type")
            .agg(
                F.lit(p).alias("pct"),
                ((F.min("bin") + 1) * HIST_WIDTH - 1).alias("est_cents"),
                F.max("n").alias("n_events"),
            )
        )
    est = est_rows[0]
    for e in est_rows[1:]:
        est = est.unionByName(e)
    # exact nearest-rank (the expensive per-group sort the sketch replaces)
    wrk = Window.partitionBy("event_type").orderBy("c", "event_id")
    d = ev.withColumn("rn", F.row_number().over(wrk)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    exact_aggs = [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n * {p} + 99) div 100"),
                F.col("c"),
            )
        ).alias(f"x{p}")
        for p in HIST_PCTS
    ]
    exact_wide = d.groupBy("event_type").agg(*exact_aggs)
    exact = None
    for p in HIST_PCTS:
        part = exact_wide.select(
            "event_type", F.lit(p).alias("pct"),
            F.col(f"x{p}").alias("exact_cents"),
        )
        exact = part if exact is None else exact.unionByName(part)
    return est.join(exact, ["event_type", "pct"]).select(
        "event_type",
        "pct",
        "n_events",
        "est_cents",
        "exact_cents",
        (F.col("est_cents") - F.col("exact_cents")).alias("err_cents"),
    )


QUERIES["hist_percentiles"] = q_hist_percentiles

ORACLES["hist_percentiles"] = f"""
    WITH ev AS (
        SELECT event_type, event_id, round(value * 100)::BIGINT AS c
        FROM events
    ), binned AS (
        SELECT event_type,
               least(c // {HIST_WIDTH}, {HIST_BINS - 1}) AS bin,
               count(*) AS cnt
        FROM ev GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, bin, cnt,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM binned
    ), pcts AS (SELECT unnest([{", ".join(map(str, HIST_PCTS))}]) AS pct),
    est AS (
        SELECT event_type, pct,
               (min(bin) + 1) * {HIST_WIDTH} - 1 AS est_cents,
               max(n)::BIGINT AS n_events
        FROM cum, pcts
        WHERE cum >= (n * pct + 99) // 100
        GROUP BY event_type, pct
    ), ranked AS (
        SELECT event_type, c,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM ev
    ), exact AS (
        SELECT event_type, pct, max(c) AS exact_cents
        FROM ranked, pcts
        WHERE rn = (n * pct + 99) // 100
        GROUP BY event_type, pct
    )
    SELECT event_type, pct, n_events, est_cents, exact_cents,
           est_cents - exact_cents AS err_cents
    FROM est JOIN exact USING (event_type, pct)
"""
