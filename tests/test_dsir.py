"""DSIR importance selection: target-like documents must outscore
off-target ones, and the keep rule is the deterministic hash threshold."""
from pdf_extractor_spark.operators.text_ops import (
    DSIR_TARGET_MOD,
    dsir_select,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_vocabulary_scores_higher(spark):
    # Targets (doc_id % 11 == 0) speak pure "wiki"; raw docs 1..3 speak
    # pure "spam"; doc 4 mixes. The wiki buckets get high target/raw
    # ratios, so the wiki-speaking raw doc 44 outscores the spam docs.
    rows = [
        (0, "wiki wiki lore lore"),
        (11, "wiki lore wiki lore"),
        (22, "wiki lore"),
        (1, "spam spam junk junk"),
        (2, "spam junk spam junk"),
        (44, "wiki lore wiki lore"),  # target by mod — same vocab
        (3, "spam junk"),
        (4, "wiki spam"),
    ]
    out = {r["doc_id"]: r for r in dsir_select(_docs(spark, rows)).collect()}
    assert out[0]["is_target"] == 1 and out[1]["is_target"] == 0
    # every pure-wiki doc outscores every pure-spam doc
    wiki_min = min(out[d]["avg_w"] for d in (0, 11, 22, 44))
    spam_max = max(out[d]["avg_w"] for d in (1, 2, 3))
    assert wiki_min > spam_max
    # the mixed doc lands strictly between
    assert spam_max < out[4]["avg_w"] < wiki_min
    # importance is the exact sum over gram instances
    assert out[0]["n_grams"] == 4
    assert out[0]["importance"] == out[0]["avg_w"] * 4 + (
        out[0]["importance"] % 4
    )


def test_keep_is_deterministic_and_monotone(spark):
    rows = [(i, "wiki lore" if i % DSIR_TARGET_MOD == 0 else "spam junk")
            for i in range(100)]
    a = {r["doc_id"]: r["keep"] for r in dsir_select(_docs(spark, rows)).collect()}
    b = {r["doc_id"]: r["keep"] for r in dsir_select(_docs(spark, rows)).collect()}
    assert a == b  # content-stable, no RNG
    # wiki docs keep at a strictly higher rate than spam docs
    wiki = [a[i] for i in range(100) if i % DSIR_TARGET_MOD == 0]
    spam = [a[i] for i in range(100) if i % DSIR_TARGET_MOD != 0]
    assert sum(wiki) / len(wiki) > sum(spam) / len(spam)


def test_empty_text_drops_out(spark):
    rows = [(0, "wiki"), (1, "   "), (2, "")]
    got = {r["doc_id"] for r in dsir_select(_docs(spark, rows)).collect()}
    assert got == {0}
