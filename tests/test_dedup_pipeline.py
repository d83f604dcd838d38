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


def test_incremental_first_batch_empty_store(spark, tmp_path):
    """A missing/empty store is a legitimate first batch: every incoming doc
    is new, pairs equal the batch's own full LSH pair set, and the store is
    created with the batch's signatures."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.dedup import (
        incremental_lsh_pairs,
        minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.01"
    new = spark.read.parquet(f"{sf}/documents.parquet").where(
        F.col("doc_id") < 100
    )
    store = str(tmp_path / "fresh_store")  # does not exist yet
    got = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_lsh_pairs(new, store).collect()
    }
    expected = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(new).collect()
    }
    assert got == expected
    assert spark.read.parquet(store).count() == 100


def test_incremental_two_phase_commit_and_retry(spark, tmp_path):
    """pairs_output mode: pairs are committed BEFORE the store append, and a
    retry after a full commit returns the committed pairs unchanged instead
    of clobbering them with an empty overwrite."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.dedup import (
        _minhash_frame,
        incremental_lsh_pairs,
        minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    old = docs.where(F.col("doc_id") < 400)
    new = docs.where(F.col("doc_id") >= 400)
    store = str(tmp_path / "store2p")
    out = str(tmp_path / "pairs_batch1")
    _minhash_frame(old).write.parquet(store)

    got = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_lsh_pairs(new, store, pairs_output=out).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    expected = {(a, b) for a, b in full if a >= 400 or b >= 400}
    assert got == expected
    assert spark.read.parquet(store).count() == 500

    # retry after full commit: anti-join finds nothing new, but the
    # COMMITTED output must be returned, not overwritten with empty
    retry = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_lsh_pairs(new, store, pairs_output=out).collect()
    }
    assert retry == expected
    assert spark.read.parquet(store).count() == 500


def test_incremental_crash_between_pairs_commit_and_store_append(spark, tmp_path):
    """Simulated driver death in the window the r02 advice flagged: attempt 1
    committed its pair output but died before the store append. The retry
    must still extend the store and return the committed pairs — the batch's
    duplicates are never lost."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.dedup import (
        _incremental_pair_plan,
        _minhash_frame,
        incremental_lsh_pairs,
    )

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    old = docs.where(F.col("doc_id") < 450)
    new = docs.where(F.col("doc_id") >= 450)
    store = str(tmp_path / "store_crash")
    out = str(tmp_path / "pairs_crash")
    _minhash_frame(old).write.parquet(store)

    # attempt 1: pairs committed, store append never happened (driver died)
    _, pairs = _incremental_pair_plan(new, spark.read.parquet(store))
    pairs.write.parquet(out)
    committed = {(r["doc_a"], r["doc_b"]) for r in spark.read.parquet(out).collect()}
    assert spark.read.parquet(store).count() == 450  # append did NOT run

    # retry: batch is still new (store unextended), existing output
    # satisfies the write, append completes
    got = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_lsh_pairs(new, store, pairs_output=out).collect()
    }
    assert got == committed
    assert spark.read.parquet(store).count() == 500
    assert spark.read.parquet(store).select("doc_id").distinct().count() == 500


def test_incremental_crash_mid_pairs_write_is_recovered(spark, tmp_path):
    """The round-3 review window: attempt 1 died DURING the pairs write, so
    the output directory exists but carries no _SUCCESS marker. A retry must
    treat that debris as uncommitted — rewrite the pairs, then append the
    store — instead of mistaking 'directory exists' for 'committed' and
    permanently losing the batch's pairs."""
    import os

    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.dedup import (
        _minhash_frame,
        incremental_lsh_pairs,
        minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    old = docs.where(F.col("doc_id") < 400)
    new = docs.where(F.col("doc_id") >= 400)
    store = str(tmp_path / "store_midcrash")
    out = str(tmp_path / "pairs_midcrash")
    _minhash_frame(old).write.parquet(store)

    # debris of a crashed attempt: directory exists, no _SUCCESS, a stray
    # in-flight temp dir — exactly what FileOutputCommitter leaves behind
    os.makedirs(os.path.join(out, "_temporary", "0"))

    got = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_lsh_pairs(new, store, pairs_output=out).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    expected = {(a, b) for a, b in full if a >= 400 or b >= 400}
    assert got == expected  # the batch's pairs were NOT lost
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert spark.read.parquet(store).count() == 500
