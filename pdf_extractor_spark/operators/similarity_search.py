"""Similarity search over the ``embeddings`` table: brute-force cosine top-k
(the correctness baseline) and a sign-bucketed IVF/LSH variant (the scale
path — candidate set shrinks by the bucket selectivity before any distance
math runs).

Everything is JVM expressions (zip_with/aggregate dot products) — no Python
in the scoring loop. Ranking uses (rounded sim desc, vec_id asc) so ties are
deterministic across engines.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.expressions import cosine_similarity_expr

N_QUERIES = 10
TOP_K = 3
N_SIGN_BITS = 8


def _emb(spark, sf_dir):
    from . import load
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the first N_QUERIES vectors. The query
    side is tiny -> broadcast it; the big side streams once."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = _emb(spark, sf_dir).alias("c").join(
        F.broadcast(queries), F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_similarity_expr(F.col("q_emb"), F.col("embedding")), 4).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "rank", "neighbor_id", "sim")
    )


def _sign_bucket(emb_col):
    """IVF-style coarse cell: sign bits of the first N_SIGN_BITS dims."""
    bits = [
        F.when(F.element_at(emb_col, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(N_SIGN_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def q_ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: candidates restricted to the query's sign-bucket (an
    equi-join on the bucket key), then exact cosine within the bucket. At
    scale this replaces the n^2 cross join with a shuffle keyed on bucket."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _sign_bucket(F.col("embedding")))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = emb.alias("c").join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    ).select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_similarity_expr(F.col("q_emb"), F.col("embedding")), 4).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "rank", "neighbor_id", "sim")
    )


N_CENTROIDS = 8


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd-style assignment step: every vector goes to its nearest of
    N_CENTROIDS fixed seed centroids (the first N vectors — deterministic,
    no RNG). The centroid table broadcasts; scoring is JVM expressions; the
    per-vector argmax is a window rank. This is the coarse-quantizer build
    step for the IVF index (q_ann_ivf_cosine is the matching probe side)."""
    emb = _emb(spark, sf_dir)
    centroids = emb.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")
    )
    # round before ranking: the argmax must not hinge on sub-ulp double
    # differences (defense-in-depth for cross-engine tie-breaking)
    scored = emb.join(F.broadcast(centroids)).select(
        "vec_id",
        "c_id",
        F.round(
            cosine_similarity_expr(F.col("embedding"), F.col("c_emb")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("c_id"))
    assigned = scored.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") == 1
    )
    return assigned.groupBy("c_id").agg(
        F.count("*").alias("n_points"),
        F.min("vec_id").alias("min_vec_id"),
    )


_DUCK_COSINE = """
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ), q AS (
            SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < {nq}
        )
"""

_DUCK_SIM = """
               round(
                 CASE WHEN sqrt(list_sum(list_transform(q.q_emb, x -> x * x))) = 0
                        OR sqrt(list_sum(list_transform(c.emb, x -> x * x))) = 0
                      THEN 0.0
                      ELSE list_sum(list_transform(range(1, len(q.q_emb) + 1),
                               i -> q.q_emb[i] * c.emb[i]))
                           / (sqrt(list_sum(list_transform(q.q_emb, x -> x * x)))
                              * sqrt(list_sum(list_transform(c.emb, x -> x * x))))
                 END, 4) AS sim
"""

ORACLES = {
    "knn_cosine": (
        _DUCK_COSINE.format(nq=N_QUERIES) + f"""
        , scored AS (
            SELECT q.q_id, c.vec_id AS neighbor_id, {_DUCK_SIM}
            FROM e c JOIN q ON c.vec_id <> q.q_id
        ), ranked AS (
            SELECT q_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT q_id, rank, neighbor_id, sim FROM ranked WHERE rank <= {TOP_K}
    """),
    "ann_ivf_cosine": (
        """
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb,
                   (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
                    + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
                    + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
                    + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
                    + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
                    + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END
                    + CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END
                    + CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
            FROM embeddings
        ), q AS (
            SELECT vec_id AS q_id, emb AS q_emb, bucket AS q_bucket
            FROM e WHERE vec_id < """ + str(N_QUERIES) + f"""
        ), scored AS (
            SELECT q.q_id, c.vec_id AS neighbor_id, {_DUCK_SIM}
            FROM e c JOIN q ON c.bucket = q.q_bucket AND c.vec_id <> q.q_id
        ), ranked AS (
            SELECT q_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT q_id, rank, neighbor_id, sim FROM ranked WHERE rank <= {TOP_K}
    """),
}

ORACLES["kmeans_assign"] = f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ), c AS (
            SELECT vec_id AS c_id, emb AS c_emb FROM e
            WHERE vec_id < {N_CENTROIDS}
        ), scored AS (
            SELECT e.vec_id, c.c_id,
                   round(
                   CASE WHEN sqrt(list_sum(list_transform(e.emb, x -> x * x))) = 0
                          OR sqrt(list_sum(list_transform(c.c_emb, x -> x * x))) = 0
                        THEN 0.0
                        ELSE list_sum(list_transform(range(1, len(e.emb) + 1),
                                 i -> e.emb[i] * c.c_emb[i]))
                             / (sqrt(list_sum(list_transform(e.emb, x -> x * x)))
                                * sqrt(list_sum(list_transform(c.c_emb, x -> x * x))))
                   END, 6) AS sim
            FROM e, c
        ), ranked AS (
            SELECT vec_id, c_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, c_id ASC) AS rk
            FROM scored
        )
        SELECT c_id, count(*) AS n_points, min(vec_id) AS min_vec_id
        FROM ranked WHERE rk = 1 GROUP BY c_id
"""

QUERIES = {
    "knn_cosine": q_knn_cosine,
    "ann_ivf_cosine": q_ann_ivf_cosine,
    "kmeans_assign": q_kmeans_assign,
}
