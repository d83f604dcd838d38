"""Gopher repetition filters: hand-computed coverage arithmetic and the
integer threshold boundaries."""
from pdf_extractor_spark.operators.text_analysis import repetition_filters


def _run(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in repetition_filters(docs).collect()}


def test_repeated_bigram_coverage(spark):
    # "ab cd" x 5 -> words [ab, cd] * 5, sum_chars = 20; the top 2-gram
    # "ab cd" occurs 5 times, word chars 4 -> top2_cover = 20 = sum_chars;
    # 100*20 > 20*20 -> keep = False.
    r = _run(spark, [(1, "ab cd " * 5)])[1]
    assert r["n_words"] == 10
    assert r["sum_chars"] == 20
    assert r["top2_cover"] == 20
    assert not r["keep"]


def test_diverse_doc_keeps(spark):
    text = " ".join(f"w{i:03d}" for i in range(50))
    r = _run(spark, [(2, text)])[2]
    assert r["n_distinct_words"] == 50
    # every bigram unique: top2_cover = one bigram's word chars = 8
    assert r["top2_cover"] == 8
    assert r["dup5_cover"] == 0
    assert r["keep"]


def test_short_doc_has_zero_covers(spark):
    r = _run(spark, [(3, "one")])[3]
    assert r["n_words"] == 1
    assert r["top2_cover"] == 0 and r["dup5_cover"] == 0
    assert r["keep"]


def test_dup5_counts_every_occurrence(spark):
    # a 5-word phrase repeated 3 times: the phrase 5-gram occurs 3 times so
    # its chars count 3x in dup5_cover (plus crossing 5-grams repeat too).
    phrase = "p1 p2 p3 p4 p5"
    r = _run(spark, [(4, " ".join([phrase] * 3))])[4]
    assert r["sum_chars"] == 30
    assert r["dup5_cover"] >= 30
    assert not r["keep"]
