"""DF-cut tests for the pair-generating dedup operators: a hot shingle /
band value shared by more than MAX_BUCKET_DOCS documents must be dropped
(bounding per-task collect_list state and O(k^2) pair output), and the drop
must be observable via the Observation metrics — never silent."""
from pyspark.sql import Observation
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.dedup import (
    MAX_BUCKET_DOCS,
    MAX_EMB_BLOCK_DOCS,
    embedding_cosine_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


def _hot_docs(spark, n_hot=MAX_BUCKET_DOCS + 10):
    """n_hot docs sharing one stop-phrase text (a hot shingle AND identical
    minhash signatures -> hot band buckets), plus one genuine near-dup pair
    that must survive the cut."""
    hot = [(i, "the quick brown fox jumps over the lazy dog") for i in range(n_hot)]
    near = [
        (1000, "alpha beta gamma delta epsilon zeta eta theta"),
        (1001, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    return spark.createDataFrame(hot + near, "doc_id long, text string")


def test_ngram_cap_bounds_hot_shingle(spark):
    docs = _hot_docs(spark)
    obs = Observation("ngram_drops")
    pairs = ngram_jaccard_pairs(docs, observation=obs).collect()
    ids = {(r.doc_a, r.doc_b) for r in pairs}
    # the hot cluster's O(n_hot^2) pairs are gone...
    assert not any(a < 1000 and b < 1000 for a, b in ids)
    # ...but the genuine near-dup pair survives
    assert (1000, 1001) in ids
    # and the drop was recorded, not silent
    assert obs.get["n_buckets_dropped"] > 0
    assert obs.get["n_ids_dropped"] >= MAX_BUCKET_DOCS + 10


def test_lsh_cap_bounds_hot_band(spark):
    docs = _hot_docs(spark)
    obs = Observation("lsh_drops")
    pairs = minhash_lsh_pairs(docs, observation=obs).collect()
    ids = {(r.doc_a, r.doc_b) for r in pairs}
    assert not any(a < 1000 and b < 1000 for a, b in ids)
    assert (1000, 1001) in ids
    assert obs.get["n_buckets_dropped"] > 0


def test_embedding_hot_label_subblock_and_cap(spark):
    """A hot label is first refined by the sign-bucket sub-key; a refined
    block still over MAX_EMB_BLOCK_DOCS is dropped with observable counts,
    while sign-spread hot labels and small labels keep their pairs."""
    n_hot = MAX_EMB_BLOCK_DOCS + 20
    rows = []
    # label 1: hot AND sign-degenerate (every vector in sign bucket 255) ->
    # the refined block is still over the cap -> dropped, observed
    for i in range(n_hot):
        rows.append((i, 1, [1.0] * 8))
    # label 2: hot but sign-spread across 16 sub-buckets (~8 vectors each,
    # well under the cap) -> in-bucket near-dup pairs survive
    for i in range(n_hot):
        bits = i % 16
        v = [1.0 if (bits >> d) & 1 else -1.0 for d in range(4)] + [1.0] * 4
        rows.append((1000 + i, 2, v))
    # label 3: small -> blk 0, pair kept untouched
    rows.append((5000, 3, [0.5] * 8))
    rows.append((5001, 3, [0.5] * 8))
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, emb array<double>"
    )
    obs = Observation("emb_drops")
    pairs = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs(emb, observation=obs).collect()
    }
    assert not any(a < 1000 and b < 1000 for a, b in pairs)
    assert any(1000 <= a < 5000 and 1000 <= b < 5000 for a, b in pairs)
    assert (5000, 5001) in pairs
    assert obs.get["n_buckets_dropped"] >= 1
    assert obs.get["n_ids_dropped"] >= n_hot


def test_cap_noop_below_threshold(spark):
    """Below the DF-cut nothing changes: pair sets with and without the cap
    are identical for a small corpus (max bucket size << MAX_BUCKET_DOCS)."""
    docs = spark.createDataFrame(
        [(i, f"cluster{i % 3} word{i % 3} tail{i % 3} end{i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    capped = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs).collect()}
    assert capped  # 3 clusters of 4 docs each -> in-cluster pairs kept
    assert all(a % 3 == b % 3 for a, b in capped)
