"""Trigram-LM fluency bins: exact integer buckets of P(c3|c2prefix)."""
from collections import Counter

import pyspark.sql.functions as F

from pdf_extractor_spark.operators.text_analysis import (
    _FLUENCY_BINS,
    lm_fluency,
)


def _brute(texts):
    """Python reference: same bins, same counts."""
    c3, c2 = Counter(), Counter()
    tris = {}
    for did, t in texts.items():
        tris[did] = [t[i : i + 3] for i in range(len(t) - 2)]
        for tr in tris[did]:
            c3[tr] += 1
            c2[tr[:2]] += 1
    out = {}
    for did, ts in tris.items():
        if not ts:
            continue
        bins = [
            sum(c3[tr] * k >= c2[tr[:2]] for k in _FLUENCY_BINS) for tr in ts
        ]
        out[did] = (len(ts), sum(bins), sum(b == 0 for b in bins))
    return out


def _run(spark, texts):
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    return {
        r["doc_id"]: (r["n_tri"], r["fluency"], r["n_rare"])
        for r in lm_fluency(docs).collect()
    }


def test_matches_python_reference(spark):
    texts = {
        0: "the cat sat on the mat",
        1: "the cat sat on the cat",
        2: "zqxj vwkp zzzz",
        3: "the the the the the the",
        4: "mixture of common and uncommon wordings",
    }
    assert _run(spark, texts) == _brute(texts)


def test_repeated_text_is_fluent(spark):
    # A doc made of corpus-dominant trigrams scores max bin everywhere.
    # Rarity is CONDITIONAL (P(c3|prefix)): a doc whose trigram shares a
    # corpus-common prefix ("ab") but takes a one-off continuation ("abz")
    # bottoms out — while a fully alien string would not (its unique
    # prefix makes its continuation probability 1).
    texts = {i: "abcabcabcabcabc" for i in range(60)}
    texts[99] = "abz"
    got = _run(spark, texts)
    n_tri, fluency, n_rare = got[0]
    assert fluency == n_tri * len(_FLUENCY_BINS)  # every bin passes
    assert got[99] == (1, 0, 1)  # rare continuation of a common prefix


def test_short_docs_dropped(spark):
    texts = {0: "ab", 1: "abcdef"}
    got = _run(spark, texts)
    assert 0 not in got and 1 in got
