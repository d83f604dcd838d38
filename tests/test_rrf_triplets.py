"""RRF fusion and training-triplet construction: crafted corpora where
the fused winner, system coverage, and exact reciprocal contributions are
known; triplets pair nearest same-label with nearest different-label."""
from pdf_extractor_spark.operators.retrieval import (
    RRF_K,
    RRF_SCALE,
    q_rrf_fusion,
)
from pdf_extractor_spark.operators.similarity_search import (
    q_training_triplets,
)


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def _vec(*head, dim=16):
    v = [1.0] * 8 + [0.0] * (dim - 8)
    for i, x in enumerate(head):
        v[8 + i] = x
    return v


def test_rrf_double_coverage_wins(spark, tmp_path):
    # doc 1: top lexical (most "dup" tokens) AND top semantic (copy of the
    # query vector) -> n_systems=2, rrf_score = 2 * (SCALE // (K+1))
    _write_docs(spark, tmp_path, [
        (1, "dup dup dup dup", "en", "s", 10),
        (2, "dup filler filler filler filler", "en", "s", 10),
        (3, "nothing relevant here", "en", "s", 10),
    ])
    _write_embeddings(spark, tmp_path, [
        (0, _vec(10.0, 0.0), 0),    # the fixed query vector
        (1, _vec(10.0, 0.0), 1),    # identical -> semantic rank 1
        (2, _vec(-10.0, 1.0), 2),
        (3, _vec(10.0, 1.0), 3),
    ])
    out = {r["doc_id"]: r for r in q_rrf_fusion(spark, str(tmp_path)).collect()}
    assert out[1]["rk"] == 1
    assert out[1]["n_systems"] == 2
    assert out[1]["rrf_score"] == 2 * (RRF_SCALE // (RRF_K + 1))
    # doc 3 is semantic-only (never contains a query term)
    assert out[3]["n_systems"] == 1


def test_triplets_pair_nearest_pos_and_neg(spark, tmp_path):
    _write_embeddings(spark, tmp_path, [
        (0, _vec(10.0), 0),          # query
        (1, _vec(9.5), 0),           # nearest same-label -> positive
        (2, _vec(8.0), 0),           # farther same-label
        (3, _vec(9.0), 1),           # nearest different-label -> negative
        (4, _vec(-10.0), 1),
    ])
    rows = q_training_triplets(spark, str(tmp_path)).where("q_id = 0").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["pos_id"], r["neg_id"]) == (1, 3)
    assert r["pos_sim"] >= r["neg_sim"]


def test_triplets_require_both_sides(spark, tmp_path):
    # query 0 has no same-label candidate -> no triplet emitted for it
    _write_embeddings(spark, tmp_path, [
        (0, _vec(10.0), 0),
        (1, _vec(9.0), 1),
        (2, _vec(8.0), 1),
    ])
    out = q_training_triplets(spark, str(tmp_path)).where("q_id = 0")
    assert out.count() == 0
