"""Exact-substring span dedup (dedup.q_substring_dup_spans internals): the
window-hash + island-merge construction on crafted docs, via the same
builders the registered query composes."""
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.dedup import SUB_W, _token_window_hashes


def _windows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    base = df.select("doc_id", toks.alias("toks")).where(
        F.size("toks") >= SUB_W
    )
    return base.select(
        "doc_id",
        F.posexplode(
            _token_window_hashes(F.col("toks"), F.size("toks"))
        ).alias("s", "h"),
    )


def test_window_count_and_positions(spark):
    text = " ".join(f"w{i}" for i in range(12))  # 12 tokens -> 5 windows
    rows = _windows(spark, [(1, text)]).orderBy("s").collect()
    assert [r["s"] for r in rows] == [0, 1, 2, 3, 4]
    # all distinct windows hash differently
    assert len({r["h"] for r in rows}) == 5


def test_shared_run_produces_merged_span(spark):
    # docs 1 and 2 share tokens a0..a9 (10 tokens -> windows s=0,1,2 in doc
    # 1); doc 2 embeds the run after 20 unique prefix tokens.
    shared = " ".join(f"a{i}" for i in range(10))
    d1 = shared + " " + " ".join(f"u{i}" for i in range(30))
    d2 = " ".join(f"v{i}" for i in range(20)) + " " + shared
    w = _windows(spark, [(1, d1), (2, d2)])
    hot = (
        w.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n"))
        .where("n >= 2")
    )
    dup = w.join(hot.select("h"), "h")
    got = {
        (r["doc_id"], r["s"]) for r in dup.collect()
    }
    # exactly the 3 windows inside the shared run, at each doc's offsets
    assert got == {(1, 0), (1, 1), (1, 2), (2, 20), (2, 21), (2, 22)}
    # merged span length = max(s) - min(s) + SUB_W = 2 + 8 = 10 tokens
    span_tokens = 2 - 0 + SUB_W
    assert span_tokens == 10


def test_distant_runs_stay_separate_islands(spark):
    # two shared 8-token runs separated by > SUB_W unique tokens must NOT
    # merge: consecutive duplicated starts differ by 20 > SUB_W.
    run1 = " ".join(f"a{i}" for i in range(SUB_W))
    run2 = " ".join(f"b{i}" for i in range(SUB_W))
    gap1 = " ".join(f"u{i}" for i in range(12))
    gap2 = " ".join(f"v{i}" for i in range(12))
    d1 = f"{run1} {gap1} {run2}"
    d2 = f"{run1} {gap2} {run2}"
    w = _windows(spark, [(1, d1), (2, d2)])
    hot = (
        w.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n"))
        .where("n >= 2")
    )
    starts = sorted(
        r["s"] for r in w.join(hot.select("h"), "h").where("doc_id = 1").collect()
    )
    assert starts == [0, 20]
    assert starts[1] - starts[0] > SUB_W  # island boundary fires


def test_ngram_novelty_is_directional(spark, tmp_path):
    """Earlier doc keeps full novelty; the later copy reports the overlap."""
    from pdf_extractor_spark.operators.dedup import q_ngram_novelty

    shared = " ".join(f"a{i}" for i in range(10))  # 3 windows
    d1 = shared + " " + " ".join(f"u{i}" for i in range(10))
    d2 = " ".join(f"v{i}" for i in range(10)) + " " + shared
    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    ).write.parquet(sf + "/documents.parquet")
    got = {r["doc_id"]: r for r in q_ngram_novelty(spark, sf).collect()}
    assert got[1]["n_seen_before"] == 0
    assert got[1]["novelty_permille"] == 1000
    # doc 2: 13 windows, the 3 inside the shared run were seen in doc 1
    assert got[2]["n_windows"] == 13
    assert got[2]["n_seen_before"] == 3
    assert got[2]["novelty_permille"] == (10 * 1000) // 13
