"""Behavioral sequence mining over the ``events`` table: frequent
contiguous event-type trigrams (the PrefixSpan/GSP sequential-pattern
shape restricted to contiguous windows) and a Bradley-Terry preference
model fit over pairwise outcomes (Hunter, Annals of Statistics 2004 —
the MM algorithm behind most pairwise-comparison / RLHF reward-shaping
aggregation).

Scale shapes:
- sequential_patterns: one per-user window (user_id is an unbounded,
  parallel partition domain) + one hash aggregate whose output is bounded
  by |event types|^3 regardless of corpus size.
- bradley_terry: the corpus-sized work is one window + one groupBy that
  reduces 10^12 events to a K x K win matrix (K = |event types|); the MM
  fit iterates driver-side on that aggregate — the same broadcast-Lloyd
  layout as kmeans_fit (sufficient statistics distributed, tiny model
  state local). All fit arithmetic is exact int64 (BT_SCALE fixed-point,
  floor division on positive operands — identical in Python, Spark, and
  DuckDB), so the DuckDB oracle replays every iteration bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .windows import _events, _user_order

MIN_SUPPORT_USERS = 5  # distinct-user support threshold for a pattern

BT_ITERS = 3            # MM iterations (unrolled in the oracle)
BT_SCALE = 1_000_000    # fixed-point rating units
_BT_S2 = BT_SCALE * BT_SCALE


def q_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent contiguous event-type trigrams with distinct-user support:
    for every (t1, t2, t3) that at least MIN_SUPPORT_USERS users performed
    consecutively, the occurrence count and the user support.

    Two lag windows per user (ordered by the injective (ep, event_id) key
    — the repo-wide deterministic total order) feed one hash aggregate;
    the result domain is bounded by |types|^3, so the aggregate's output
    (and any broadcast of it) stays tiny at any corpus size."""
    w = _user_order()
    tri = (
        _events(spark, sf_dir)
        .select(
            "user_id",
            F.lag("event_type", 2).over(w).alias("t1"),
            F.lag("event_type", 1).over(w).alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .where(F.col("t1").isNotNull())
    )
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .where(F.col("n_users") >= MIN_SUPPORT_USERS)
    )


def _bt_ratings(win_rows: list) -> dict:
    """Exact fixed-point MM fit from (w_type, l_type, n) win counts.

    Hunter's MM update w_i <- W_i / sum_j n_ij / (w_i + w_j), carried in
    BT_SCALE units with floor division: every operand is a positive int64,
    so Python ``//``, Spark ``div`` and DuckDB ``//`` (both truncate toward
    zero) agree exactly. Returns {type: (rating, n_wins, n_matches)}."""
    wins: dict = {}
    for r in win_rows:
        wins[(r["w_type"], r["l_type"])] = wins.get(
            (r["w_type"], r["l_type"]), 0
        ) + r["n"]
    types = sorted({t for pair in wins for t in pair})
    n_ij = {
        (a, b): wins.get((a, b), 0) + wins.get((b, a), 0)
        for a in types
        for b in types
        if a != b
    }
    total_wins = {
        t: sum(n for (a, _), n in wins.items() if a == t) for t in types
    }
    rating = {t: BT_SCALE for t in types}
    for _ in range(BT_ITERS):
        new = {}
        for i in types:
            denom = sum(
                (n_ij[(i, j)] * _BT_S2) // max(rating[i] + rating[j], 1)
                for j in types
                if j != i and n_ij[(i, j)] > 0
            )
            new[i] = (
                (total_wins[i] * _BT_S2) // max(denom, 1)
                if total_wins[i] > 0
                else 0
            )
        rating = new
    return {
        t: (
            rating[t],
            total_wins[t],
            sum(n_ij[(t, j)] for j in types if j != t),
        )
        for t in types
    }


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry skill ratings over event types: each consecutive
    same-user event pair with different types and different cents values
    is one pairwise comparison won by the larger value; the MM fit turns
    the win matrix into ratings. The corpus reduces to the K x K matrix
    in one window + one groupBy; the fit is driver-side exact-int64
    fixed-point arithmetic on that aggregate (see module docstring).

    Output: event_type, rating (BT_SCALE units), n_wins, n_matches."""
    w = _user_order()
    ev = _events(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    cmp = ev.select(
        F.lag("event_type").over(w).alias("ta"),
        F.lag("cents").over(w).alias("ca"),
        F.col("event_type").alias("tb"),
        F.col("cents").alias("cb"),
    ).where(
        F.col("ta").isNotNull()
        & (F.col("ta") != F.col("tb"))
        & (F.col("ca") != F.col("cb"))
    )
    first_wins = F.col("ca") > F.col("cb")
    win_rows = (
        cmp.select(
            F.when(first_wins, F.col("ta")).otherwise(F.col("tb")).alias(
                "w_type"
            ),
            F.when(first_wins, F.col("tb")).otherwise(F.col("ta")).alias(
                "l_type"
            ),
        )
        .groupBy("w_type", "l_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    fitted = _bt_ratings(win_rows)
    return spark.createDataFrame(
        [
            (t, rating, n_wins, n_matches)
            for t, (rating, n_wins, n_matches) in sorted(fitted.items())
        ],
        "event_type string, rating long, n_wins long, n_matches long",
    )


QUERIES = {
    "sequential_patterns": q_sequential_patterns,
    "bradley_terry": q_bradley_terry,
}

ORACLES = {
    "sequential_patterns": f"""
        WITH tri AS (
            SELECT user_id,
                   lag(event_type, 2) OVER w AS t1,
                   lag(event_type, 1) OVER w AS t2,
                   event_type AS t3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT t1, t2, t3,
               count(*) AS n_occurrences,
               count(DISTINCT user_id)::BIGINT AS n_users
        FROM tri WHERE t1 IS NOT NULL
        GROUP BY 1, 2, 3
        HAVING count(DISTINCT user_id) >= {MIN_SUPPORT_USERS}
    """,
}


def _bt_oracle() -> str:
    """Unrolled MM replay: r0 = BT_SCALE everywhere, then BT_ITERS rounds
    of denominator-sum + ratio, all in int64 floor division (DuckDB ``//``
    truncates toward zero == floor on these positive operands)."""
    parts = [f"""
        WITH ev AS (
            SELECT user_id, event_type,
                   round(value * 100)::BIGINT AS cents, ts, event_id
            FROM events
        ), cmp AS (
            SELECT lag(event_type) OVER w AS ta, lag(cents) OVER w AS ca,
                   event_type AS tb, cents AS cb
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), m AS (
            SELECT CASE WHEN ca > cb THEN ta ELSE tb END AS w_type,
                   CASE WHEN ca > cb THEN tb ELSE ta END AS l_type
            FROM cmp
            WHERE ta IS NOT NULL AND ta <> tb AND ca <> cb
        ), wins AS (
            SELECT w_type, l_type, count(*) AS n FROM m GROUP BY 1, 2
        ), nm AS (
            SELECT i, j, sum(n)::BIGINT AS n_ij FROM (
                SELECT w_type AS i, l_type AS j, n FROM wins
                UNION ALL
                SELECT l_type AS i, w_type AS j, n FROM wins
            ) GROUP BY 1, 2
        ), tw AS (
            SELECT n.i AS t,
                   coalesce(w.total, 0)::BIGINT AS n_wins,
                   sum(n.n_ij)::BIGINT AS n_matches
            FROM nm n
            LEFT JOIN (
                SELECT w_type, sum(n)::BIGINT AS total FROM wins GROUP BY 1
            ) w ON w.w_type = n.i
            GROUP BY 1, 2
        ), r0 AS (
            SELECT t, {BT_SCALE}::BIGINT AS w FROM tw
        )"""]
    for it in range(1, BT_ITERS + 1):
        parts.append(f"""
        , d{it} AS (
            SELECT n.i AS t,
                   sum((n.n_ij * {_BT_S2}::BIGINT)
                       // greatest(wi.w + wj.w, 1))::BIGINT AS denom
            FROM nm n
            JOIN r{it - 1} wi ON wi.t = n.i
            JOIN r{it - 1} wj ON wj.t = n.j
            GROUP BY 1
        ), r{it} AS (
            SELECT tw.t,
                   CASE WHEN tw.n_wins > 0
                        THEN (tw.n_wins * {_BT_S2}::BIGINT)
                             // greatest(d.denom, 1)
                        ELSE 0 END AS w
            FROM tw JOIN d{it} d ON d.t = tw.t
        )""")
    parts.append(f"""
        SELECT tw.t AS event_type, r.w AS rating, tw.n_wins, tw.n_matches
        FROM tw JOIN r{BT_ITERS} r ON r.t = tw.t
    """)
    return "".join(parts)


ORACLES["bradley_terry"] = _bt_oracle()


# Candidate-batch size for preference-pair construction: doc_id div
# PREF_GROUP plays the "N sampled responses to one prompt" batch an RLHF
# collection pipeline scores together.
PREF_GROUP = 8


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction — the (chosen, rejected) dataset step
    every DPO/RLHF fine-tune needs (Rafailov et al. 2023 consume exactly
    this shape; bradley_terry is the downstream FIT over such pairs, this
    op is the upstream BUILDER): within each candidate batch, the
    top-scored document becomes ``chosen`` and the bottom-scored becomes
    ``rejected``, with a fully deterministic composite score and explicit
    tie-breaks (score desc, doc_id asc for chosen; score asc, doc_id desc
    for rejected) so both engines pick identical pairs. Score is the
    integer composite 1000*n_words + alpha-permille — the Gopher-style
    length gate with an alpha-density refinement, all exact arithmetic.

    Scale shape: one pure map for the score, two per-group window passes
    (group key is unbounded -> parallel), one equi self-pairing via
    groupBy-free join of the two rank-1 frames on the group key. Batches
    with a single candidate emit nothing (no degenerate pairs)."""
    from . import load

    docs = load(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_words = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    n_alpha = F.length(F.regexp_replace("text", r"[^\p{L}]+", ""))
    base = docs.select(
        "doc_id",
        F.expr(f"div(doc_id, {PREF_GROUP})").alias("grp"),
        n_words.cast("long").alias("nw"),
        n_alpha.cast("long").alias("na"),
        n_chars.cast("long").alias("nc"),
    )
    scored = base.select(
        "doc_id",
        "grp",
        (
            F.lit(1000) * F.col("nw")
            + F.expr("div(na * 1000, greatest(nc, 1))")
        ).cast("long").alias("score"),
    )
    wb = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("doc_id"))
    ww = Window.partitionBy("grp").orderBy(F.asc("score"), F.desc("doc_id"))
    ranked = scored.withColumn("rk_b", F.row_number().over(wb)).withColumn(
        "rk_w", F.row_number().over(ww)
    )
    chosen = ranked.where(F.col("rk_b") == 1).select(
        "grp",
        F.col("doc_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
    )
    rejected = ranked.where(F.col("rk_w") == 1).select(
        "grp",
        F.col("doc_id").alias("rejected_id"),
        F.col("score").alias("rejected_score"),
    )
    return (
        chosen.join(rejected, "grp")
        .where(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "grp",
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias(
                "score_gap"
            ),
        )
    )


QUERIES["preference_pairs"] = q_preference_pairs

ORACLES["preference_pairs"] = f"""
    WITH base AS (
        SELECT doc_id,
               doc_id // {PREF_GROUP} AS grp,
               len(list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> ''))::BIGINT AS nw,
               length(regexp_replace(text, '[^\\p{{L}}]+', '', 'g'))::BIGINT
                   AS na,
               length(text)::BIGINT AS nc
        FROM documents
    ), scored AS (
        SELECT doc_id, grp,
               (1000 * nw + (na * 1000) // greatest(nc, 1))::BIGINT AS score
        FROM base
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY grp
                                  ORDER BY score DESC, doc_id ASC) AS rk_b,
               row_number() OVER (PARTITION BY grp
                                  ORDER BY score ASC, doc_id DESC) AS rk_w
        FROM scored
    )
    SELECT c.grp,
           c.doc_id AS chosen_id,
           r.doc_id AS rejected_id,
           c.score AS chosen_score,
           r.score AS rejected_score,
           (c.score - r.score)::BIGINT AS score_gap
    FROM (SELECT * FROM ranked WHERE rk_b = 1) c
    JOIN (SELECT * FROM ranked WHERE rk_w = 1) r USING (grp)
    WHERE c.doc_id <> r.doc_id
"""
