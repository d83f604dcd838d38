"""Windowed PMI co-occurrence: exclusive pairs outrank promiscuous ones,
the window bound and count floors hold, pairs are unordered."""
from pdf_extractor_spark.operators.text_analysis import (
    PMI_MIN_PAIR,
    PMI_MIN_TERM,
    PMI_SCALE,
    PMI_WINDOW,
    q_cooccurrence_pmi,
)


def _write(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_exclusive_pair_outranks_promiscuous(spark, tmp_path):
    # "alpha beta" is exclusive; "noise" pairs with three different
    # partners, so its unigram count is 3x any pair count — PMI dilutes it
    reps = max(PMI_MIN_PAIR, PMI_MIN_TERM)
    docs = [(i, "alpha beta", "en", "s", 10) for i in range(reps)]
    docs += [
        (len(docs) + i * reps + j, f"noise {partner}", "en", "s", 10)
        for i, partner in enumerate(["gamma", "delta", "epsilon"])
        for j in range(reps)
    ]
    sf = _write(spark, tmp_path, docs)
    rows = q_cooccurrence_pmi(spark, sf).collect()
    got = {(r["x"], r["y"]): r for r in rows}
    assert ("alpha", "beta") in got and ("gamma", "noise") in got
    # T = 8*reps tokens; exclusive pair: n*T*S/(n*n) = 8S; noise pair:
    # same pair count but a 3x unigram count -> floor(8S/3)
    assert got[("alpha", "beta")]["score"] == 8 * PMI_SCALE
    assert got[("gamma", "noise")]["score"] == (8 * PMI_SCALE) // 3
    assert got[("alpha", "beta")]["rk"] == 1


def test_window_bound_and_floors(spark, tmp_path):
    # "head" and "tail" sit PMI_WINDOW+1 apart -> never a pair
    gap = " ".join(f"mid{i}" for i in range(PMI_WINDOW))
    reps = max(PMI_MIN_PAIR, PMI_MIN_TERM)
    docs = [(i, f"head {gap} tail", "en", "s", 10) for i in range(reps)]
    sf = _write(spark, tmp_path, docs)
    got = {(r["x"], r["y"]) for r in q_cooccurrence_pmi(spark, sf).collect()}
    assert ("head", "tail") not in got
    # pairs are canonically ordered (x < y)
    assert all(x < y for x, y in got)
