"""Exact-threshold set-similarity join via PREFIX FILTERING (the
PPJoin/AllPairs family — Bayardo et al. WWW'07, Xiao et al. WWW'08, public
literature): find every document pair whose shingle-set Jaccard clears the
threshold, with NO false negatives — the exact counterpart of the
MinHash-LSH candidate path in operators/dedup.py (LSH trades recall for
speed; this operator trades nothing and still never compares all pairs).

The filter principle: order every set by GLOBAL token rarity (df asc,
token asc). If Jaccard(A, B) >= t, the two sets must overlap within their
first |s| - ceil(t*|s|) + 1 rarest tokens — so only pairs sharing a PREFIX
token are candidates. Rare tokens make small buckets: the candidate join is
keyed on exactly the tokens least likely to fan out (the anti-hot-key
property that makes this scale where a raw token self-join explodes).
A length filter (t <= |A|/|B| <= 1/t, cross-multiplied integers) prunes
further before verification; exact verification joins the candidate pair
ids back to their full sorted shingle arrays (doc-keyed) and tests
Q*o >= P*(|A|+|B|-o) in integers.

The oracle is the brute-force ALL-PAIRS exact join (DuckDB list_intersect
over every doc pair) — a completely different algorithm; agreement IS the
no-false-negative guarantee, measured rather than argued.

Threshold t = 1/2; prefix length for |s| is div(s,2)+1 (floor math
identical in both engines for non-negative sizes).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.expressions import word_shingles_expr
from .dedup import _DUCK_SHINGLES

TAU_P, TAU_Q = 1, 2  # Jaccard threshold as the exact rational P/Q


def ppjoin_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, inter, union_sz, j_permille) for every pair with
    shingle-Jaccard >= TAU_P/TAU_Q — exact, prefix-filtered."""
    sh_rows = docs.select(
        "doc_id", F.explode(word_shingles_expr(F.col("text"))).alias("sh")
    ).localCheckpoint(eager=True)
    sizes = sh_rows.groupBy("doc_id").agg(F.count("*").alias("s"))
    df_t = sh_rows.groupBy("sh").agg(F.count("*").alias("df"))
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "sh")
    )
    prefix = (
        sh_rows.join(df_t, "sh")
        .withColumn("rk", rk)
        .join(sizes, "doc_id")
        .where(F.col("rk") <= F.expr(f"div(s * {TAU_Q - TAU_P}, {TAU_Q}) + 1"))
        .select("doc_id", "sh", "s")
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), "sh", F.col("s").alias("sa")
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), "sh", F.col("s").alias("sb")
    )
    candidates = (
        a.join(b, "sh")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            # length filter: t <= |A|/|B| <= 1/t, cross-multiplied
            & (F.col("sa") * TAU_Q >= F.col("sb") * TAU_P)
            & (F.col("sb") * TAU_Q >= F.col("sa") * TAU_P)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sets = sh_rows.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("sh")).alias("arr")
    )
    verified = (
        candidates.join(
            sets.select(
                F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a")
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("inter"),
            (F.size("arr_a") + F.size("arr_b")).alias("_tot"),
        )
        .withColumn("union_sz", F.col("_tot") - F.col("inter"))
        .where(F.col("inter") * TAU_Q >= F.col("union_sz") * TAU_P)
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter",
        "union_sz",
        F.expr("div(inter * 1000, union_sz)").alias("j_permille"),
    )


def q_ppjoin_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load

    return ppjoin_pairs(load(spark, sf_dir, "documents"))


QUERIES = {"ppjoin_similar": q_ppjoin_similar}

ORACLES = {
    # brute-force all-pairs exact join: the independent ground truth
    "ppjoin_similar": _DUCK_SHINGLES + f"""
        , pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.shingles, b.shingles)) AS o,
                   len(a.shingles) AS sa, len(b.shingles) AS sb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
        )
        SELECT doc_a, doc_b, o AS inter,
               sa + sb - o AS union_sz,
               o * 1000 // (sa + sb - o) AS j_permille
        FROM pairs
        WHERE o * {TAU_Q} >= (sa + sb - o) * {TAU_P}
    """,
}
