"""Hard-negative mining: same-label vectors are never negatives, the
nearest different-label vector ranks first, and candidates ride the
multi-probe sign-bucket join."""
from pdf_extractor_spark.operators.similarity_search import (
    q_hard_negatives,
)


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path)


def _vec(*head, dim=16):
    # first 8 dims positive -> every vector shares sign-bucket 255, so the
    # probe join is total and the test isolates the label/ranking logic
    v = [1.0] * 8 + [0.0] * (dim - 8)
    for i, x in enumerate(head):
        v[8 + i] = x
    return v


def test_same_label_excluded_and_nearest_negative_first(spark, tmp_path):
    rows = [
        (0, _vec(10.0), 0),          # query
        (1, _vec(10.0), 0),          # identical but same label: excluded
        (2, _vec(9.0), 1),           # nearest different-label
        (3, _vec(-10.0), 1),         # far different-label
    ]
    sf = _write(spark, tmp_path, rows)
    out = q_hard_negatives(spark, sf).where("q_id = 0").orderBy("rank")
    got = [(r["rank"], r["neighbor_id"], r["neg_label"]) for r in out.collect()]
    assert got[0] == (1, 2, 1)
    assert all(nid != 1 for _, nid, _ in got)  # same-label never appears
    assert got[-1] == (len(got), 3, 1)


def test_self_never_a_negative(spark, tmp_path):
    # the label filter subsumes self-exclusion
    rows = [
        (0, _vec(5.0), 0),
        (1, _vec(4.0), 1),
        (2, _vec(3.0), 2),
    ]
    sf = _write(spark, tmp_path, rows)
    for r in q_hard_negatives(spark, sf).collect():
        assert r["neighbor_id"] != r["q_id"]
