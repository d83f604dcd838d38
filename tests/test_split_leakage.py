"""split_leakage behavioral tests: near-dup pairs crossing the md5 holdout
boundary. Toy corpus = near-orthogonal basis vectors with three exact
duplicates injected: one crossing test/train (id 3 ~ id 5), one crossing
val/train (id 22 ~ id 7), and one train-internal (id 1 ~ id 8) that must be
filtered out. Splits are determined by md5(vec_id) — ids chosen so the
expected split of every actor is known (3,17=test; 22,36=val; rest train)."""
from pdf_extractor_spark.operators.dedup import q_split_leakage

DIM = 64


def _toy_embeddings(spark, tmp_path):
    ids = list(range(24))
    dup_of = {3: 5, 22: 7, 8: 1}
    rows = []
    for i in ids:
        basis = dup_of.get(i, i)
        vec = [0.0] * DIM
        vec[basis % DIM] = 1.0
        rows.append((i, vec, 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_cross_split_pairs_only(spark, tmp_path):
    sf_dir = _toy_embeddings(spark, tmp_path)
    out = q_split_leakage(spark, sf_dir)
    assert out.columns == [
        "vec_a", "vec_b", "sim", "split_a", "split_b", "leaks_train",
    ]
    rows = {(r["vec_a"], r["vec_b"]): r for r in out.collect()}
    # the two cross-split duplicates surface; the train-internal one doesn't
    assert set(rows) == {(3, 5), (7, 22)}
    r = rows[(3, 5)]
    assert (r["split_a"], r["split_b"]) == ("test", "train")
    assert r["leaks_train"] is True
    assert r["sim"] == 1.0
    r = rows[(7, 22)]
    assert (r["split_a"], r["split_b"]) == ("train", "val")
    assert r["leaks_train"] is True


def test_sf_corpus_has_leaks(spark):
    rows = q_split_leakage(spark, "/root/testdata/sf0.001").collect()
    # every surfaced pair crosses the boundary by construction
    assert all(r["split_a"] != r["split_b"] for r in rows)
    assert all(
        r["leaks_train"]
        == ("train" in (r["split_a"], r["split_b"]))
        for r in rows
    )
