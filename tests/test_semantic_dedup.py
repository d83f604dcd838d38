"""SemDeDup behavioral tests: learned-cluster blocking + greedy min-id
retention. Toy corpus = 16 near-orthogonal basis vectors (cosine 0 between
distinct ids) with one exact duplicate injected, so the only near-dup pair
is the injected one and the retention verdict is fully determined."""
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.dedup import q_semantic_dedup
from pdf_extractor_spark.operators.similarity_search import KMEANS_DIM


def _toy_embeddings(spark, tmp_path):
    """16 vectors of dim KMEANS_DIM: vec i = basis e_{4i}, except vec 12
    which duplicates vec 5 exactly. vec_ids 0..7 satisfy the fit's seed
    contract."""
    rows = []
    for i in range(16):
        basis = 4 * (5 if i == 12 else i)
        vec = [0.0] * KMEANS_DIM
        vec[basis] = 1.0
        rows.append((i, vec, 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_duplicate_dropped_original_kept(spark, tmp_path):
    sf_dir = _toy_embeddings(spark, tmp_path)
    out = {r["vec_id"]: r for r in q_semantic_dedup(spark, sf_dir).collect()}
    assert len(out) == 16
    # the exact duplicate (larger vec_id) is the one dropped
    assert out[12]["keep"] is False
    assert out[5]["keep"] is True
    # everything else is orthogonal -> kept
    assert sum(1 for r in out.values() if r["keep"]) == 15
    # duplicates land in the same learned cluster (identical vectors have
    # identical centroid distances and the same argmin tie-break)
    assert out[12]["cluster"] == out[5]["cluster"]


def test_sf_corpus_shape(spark):
    out = q_semantic_dedup(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    # one verdict per (64-dim) vector, keepers present in every cluster
    assert out.columns == ["vec_id", "cluster", "keep"]
    per_cluster_keep = (
        out.groupBy("cluster").agg(F.sum(F.col("keep").cast("int")).alias("k"))
    ).collect()
    assert len(rows) == 500
    assert all(r["k"] >= 1 for r in per_cluster_keep)
