"""dedup_pair_audit invariants: counts are consistent and the audit catches
the corpus's injected near-dups on the real sf0.001 tables."""
from pdf_extractor_spark.operators.dedup import q_dedup_pair_audit


def test_audit_count_invariants(spark):
    row = q_dedup_pair_audit(spark, "/root/testdata/sf0.001").collect()[0]
    # hits are the intersection: bounded by both sides
    assert 0 <= row["n_hits"] <= row["n_true"]
    assert row["n_hits"] <= row["n_pred"]
    # the corpus carries injected near-dups and LSH banding with 8 single-
    # hash bands catches an exact-duplicate's band trivially — a zero here
    # means the candidate filter broke
    assert row["n_true"] > 0
    assert row["n_hits"] > 0
