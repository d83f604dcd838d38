"""Rational BM25: ranking properties + agreement with float BM25."""
import math

import pyspark.sql.functions as F

from pdf_extractor_spark.operators import retrieval


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rare_term_outranks_common(spark):
    rows = [
        (1, "rare alpha beta"),        # rare term, short
        (2, "common common alpha"),    # only the common term
        (3, "common beta gamma"),
        (4, "common alpha gamma"),
        (5, "alpha beta gamma"),       # no query terms
    ]
    out = retrieval.bm25_top_k(
        _corpus(spark, rows), ["rare", "common"], k=5
    ).collect()
    assert out[0].doc_id == 1  # df(rare)=1 beats df(common)=3
    assert all(r.doc_id != 5 for r in out)  # no-match docs never appear


def test_tf_and_length_monotonicity(spark):
    rows = [
        (1, "term filler filler filler"),
        (2, "term term filler filler"),            # higher tf, same dl
        (3, "term filler filler filler filler filler"),  # same tf, longer
    ]
    out = {
        r.doc_id: r.score
        for r in retrieval.bm25_top_k(_corpus(spark, rows), ["term"], k=3)
        .collect()
    }
    assert out[2] > out[1]  # tf saturating but increasing
    assert out[1] > out[3]  # length normalization penalizes doc 3


def _float_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in rows}
    n = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if not tf:
                continue
            idf = (n - df[q] + 0.5) / (df[q] + 0.5)  # log dropped, same
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if s:
            scores[d] = s
    return sorted(scores, key=lambda d: (-scores[d], d))


def test_matches_float_ranking(spark):
    rows = [
        (i, " ".join(
            (["query"] * (i % 4)) + (["spark"] * (i % 3))
            + ["pad"] * (i % 7)
        ))
        for i in range(1, 30)
    ]
    rows = [(d, t) for d, t in rows if t.strip()]
    got = [
        r.doc_id
        for r in retrieval.bm25_top_k(
            _corpus(spark, rows), ["query", "spark"], k=10
        ).collect()
    ]
    want = _float_bm25(rows, ["query", "spark"])[:10]
    assert got == want


def test_query_shape(spark):
    out = retrieval.q_bm25_top_k(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) <= retrieval.BM25_TOP_K
    ranks = [r.rk for r in rows]
    assert ranks == sorted(ranks) == list(range(1, len(rows) + 1))
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
