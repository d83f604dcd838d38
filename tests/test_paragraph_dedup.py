"""C4-style repeated-passage removal: passages seen >= MIN_PARA_COUNT times
corpus-wide are boilerplate and vanish from every document; unique passages
survive byte-exactly in order."""
from pdf_extractor_spark.operators.dedup import (
    MIN_PARA_COUNT,
    PARA_WORDS,
    paragraph_dedup,
)

BANNER = " ".join(f"boiler{i}" for i in range(PARA_WORDS))


def _doc(i, n_words=30):
    return " ".join(f"w{i}_{j}" for j in range(n_words))


def test_hot_passage_removed_everywhere(spark):
    rows = [(i, BANNER + " " + _doc(i)) for i in range(MIN_PARA_COUNT)]
    rows.append((99, _doc(99)))  # clean doc, untouched
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    for i in range(MIN_PARA_COUNT):
        assert got[i]["n_removed"] == 1
        assert got[i]["clean_text"] == _doc(i)
        assert "boiler0" not in got[i]["clean_text"]
    assert got[99]["n_removed"] == 0
    assert got[99]["clean_text"] == _doc(99)


def test_below_threshold_passage_survives(spark):
    rows = [(i, BANNER + " " + _doc(i)) for i in range(MIN_PARA_COUNT - 1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    for i in range(MIN_PARA_COUNT - 1):
        assert got[i]["n_removed"] == 0
        assert got[i]["clean_text"] == BANNER + " " + _doc(i)


def test_fully_boilerplate_doc_comes_back_empty(spark):
    rows = [(i, BANNER) for i in range(MIN_PARA_COUNT)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert all(r["clean_text"] == "" and r["n_paras"] == 1 for r in got.values())


def test_order_preserved_across_removals(spark):
    mid = " ".join(f"mid{j}" for j in range(PARA_WORDS))
    text = BANNER + " " + mid + " " + BANNER + " tail words here"
    rows = [(0, text), (1, BANNER), (2, BANNER)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert got[0]["n_paras"] == 4 and got[0]["n_removed"] == 2
    assert got[0]["clean_text"] == mid + " tail words here"
