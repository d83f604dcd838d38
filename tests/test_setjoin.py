"""PPJoin exact set-similarity join: no false negatives vs brute force,
boundary inclusivity, and the prefix filter actually pruning."""
import itertools

import pyspark.sql.functions as F

from pdf_extractor_spark.operators import setjoin
from pdf_extractor_spark.functions.expressions import word_shingles_expr


def _shingles(text, k=3):
    ws = text.split()
    if not ws:
        return set()
    if len(ws) < k:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


def _brute(rows, p=setjoin.TAU_P, q=setjoin.TAU_Q):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        a, b = _shingles(ta), _shingles(tb)
        if not a or not b:
            continue
        o = len(a & b)
        u = len(a | b)
        if o * q >= u * p:
            key = (min(ia, ib), max(ia, ib))
            out[key] = (o, u, o * 1000 // u)
    return out


def test_no_false_negatives_or_positives(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " extra"),                    # near-dup of 1
        (3, base.replace("quick", "slow")),      # near-dup of 1
        (4, "completely different words here entirely unrelated text"),
        (5, "another unrelated document about spark and shuffles"),
        (6, base),                               # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.union_sz, r.j_permille)
        for r in setjoin.ppjoin_pairs(df).collect()
    }
    assert got == _brute(rows)
    assert (1, 6) in got and got[(1, 6)][2] == 1000  # exact dup found


def test_boundary_jaccard_inclusive(spark):
    # construct sets with Jaccard exactly 1/2: |A|=2 shingles, |B|=2,
    # overlap... use 4-word docs sharing a 3-word suffix/prefix
    rows = [
        (1, "a b c d"),   # shingles {a b c, b c d}
        (2, "b c d e"),   # shingles {b c d, c d e} -> o=1, u=3 -> 1/3 < 1/2
        (3, "a b c d"),   # identical -> 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b) for r in setjoin.ppjoin_pairs(df).collect()}
    assert got == {(1, 3)}


def test_prefix_filter_prunes(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh_rows = docs.select(
        "doc_id", F.explode(word_shingles_expr(F.col("text"))).alias("sh")
    )
    all_sharing = (
        sh_rows.alias("a")
        .join(sh_rows.alias("b"), "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    result = setjoin.q_ppjoin_similar(spark, "/root/testdata/sf0.001")
    n_result = result.count()
    # the exact join returns only true pairs; sharing-any-shingle pairs are
    # two orders of magnitude more — the filter is what makes this viable
    assert n_result < all_sharing / 50
    assert n_result > 0
