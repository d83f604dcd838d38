"""LSH-then-score pipeline: the signature frame must be computed once
(materialized to parquet) and feed BOTH the band explode and the two score
join sides — no recomputation of the shingle->md5->min subtree downstream."""
import itertools

from pdf_extractor_spark.kernels.textstats import minhash_signature
from pdf_extractor_spark.operators.dedup import N_MINHASH, lsh_score_pipeline

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),  # near-dup of 0
    (2, "completely different words nothing shared here at all ok"),
    (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),   # exact dup of 0
    (4, "unrelated content again with its own vocabulary entirely"),
]


def _expected_pairs(threshold=0.5):
    sigs = {i: minhash_signature(t, n_hashes=N_MINHASH) for i, t in DOCS}
    out = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / N_MINHASH
        if est >= threshold:
            out[(a, b)] = round(est, 4)
    return out


def test_lsh_score_pipeline_matches_bruteforce(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ckpt = str(tmp_path / "sigs.parquet")
    got = {
        (r.doc_a, r.doc_b): r.jaccard_est
        for r in lsh_score_pipeline(docs, ckpt, threshold=0.5).collect()
    }
    expected = _expected_pairs(0.5)
    # LSH candidates are a subset of all pairs, but any pair >= threshold
    # shares >= 4 of 8 single-hash bands, so banding cannot miss it here
    assert got == expected
    assert (0, 3) in got and got[(0, 3)] == 1.0


def test_signatures_computed_once(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ckpt = str(tmp_path / "sigs2.parquet")
    scored = lsh_score_pipeline(docs, ckpt, threshold=0.0)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # every branch reads the materialized signatures...
    assert plan.count("Scan parquet") >= 3
    # ...and nothing re-derives them: no md5/shingle machinery and no scan of
    # the original in-memory docs frame anywhere downstream of the checkpoint
    assert "md5" not in plan
    assert "LocalTableScan" not in plan


def test_incremental_lsh_matches_full_run(spark, tmp_path):
    """Two-batch incremental dedup == full-corpus pairs filtered to pairs
    involving each batch's new docs; the store grows batch by batch."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.dedup import (
        _minhash_frame,
        incremental_lsh_pairs,
        minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    SPLIT = 400
    old = docs.where(F.col("doc_id") < SPLIT)
    new = docs.where(F.col("doc_id") >= SPLIT)
    store = str(tmp_path / "sigstore")

    # batch 0 seeds the store
    _minhash_frame(old).write.parquet(store)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_lsh_pairs(new, store).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    expected = {
        (a, b) for a, b in full if a >= SPLIT or b >= SPLIT
    }
    assert got == expected
    assert got  # the split actually exercises cross-batch pairs

    # store now contains ALL signatures -> a rerun with zero new docs
    # finds nothing
    empty = incremental_lsh_pairs(new.limit(0), store)
    assert empty.count() == 0


def test_incremental_retry_is_safe(spark, tmp_path):
    """Re-submitting an already-committed batch must not duplicate store
    rows, emit self-pairs, or emit anything at all."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.dedup import (
        _minhash_frame,
        incremental_lsh_pairs,
    )

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    old = docs.where(F.col("doc_id") < 450)
    new = docs.where(F.col("doc_id") >= 450)
    store = str(tmp_path / "sigstore_retry")
    _minhash_frame(old).write.parquet(store)

    first = incremental_lsh_pairs(new, store).collect()
    assert all(r["doc_a"] != r["doc_b"] for r in first)
    n_store = spark.read.parquet(store).count()
    assert n_store == 500

    # retry the same batch: nothing new, store unchanged
    retry = incremental_lsh_pairs(new, store).collect()
    assert retry == []
    assert spark.read.parquet(store).count() == 500
    assert (
        spark.read.parquet(store).select("doc_id").distinct().count() == 500
    )


def test_corpus_merge_provenance(spark):
    """Cross-source merge collapses same-content docs and keeps sorted
    source provenance (the sf corpus has no cross-source dups, so pin the
    behavior with crafted rows)."""
    import pdf_extractor_spark.operators.dedup as D

    rows = [
        (1, "Same Content here!", "en", "crawl_a", 18),
        (2, "same   content HERE", "en", "crawl_b", 19),  # same normalized
        (3, "different content", "en", "crawl_a", 17),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import pdf_extractor_spark.operators as O
    orig = O.load
    O.load = lambda s, d, n: df
    try:
        got = {r["canonical_id"]: r for r in D.q_corpus_merge(spark, "x").collect()}
    finally:
        O.load = orig
    assert set(got) == {1, 3}
    assert got[1]["n_copies"] == 2
    assert got[1]["sources"] == "crawl_a,crawl_b"
    assert got[3]["n_copies"] == 1
