"""Token packing: the two-level distributed prefix sum must equal the naive
single-window layout, across bucket boundaries, empty and spanning docs."""
import pyspark.sql.functions as F
from pyspark.sql import Window

from pdf_extractor_spark.operators.packing import (
    PACK_BUCKET,
    SEQ_TOKENS,
    token_packing,
)


def _naive(df):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    return {
        r["doc_id"]: r["global_start"]
        for r in df.withColumn(
            "global_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        ).collect()
    }


def test_matches_naive_prefix_sum_across_buckets(spark):
    # 3+ buckets with gaps and uneven ids
    rows = [(i, f"tok {'x ' * (i % 7)}") for i in range(0, PACK_BUCKET * 3, 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["global_start"]
        for r in token_packing(docs).collect()
    }
    counted = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    assert got == _naive(counted)


def test_spanning_and_empty_docs(spark):
    big = "w " * (SEQ_TOKENS + 10)  # spans a boundary from offset 0
    docs = spark.createDataFrame(
        [(1, big), (2, ""), (3, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in token_packing(docs).collect()}
    assert out[1]["seq_id"] == 0 and out[1]["n_seqs"] == 2
    assert out[2]["n_tokens"] == 0 and out[2]["n_seqs"] == 0
    # doc 3 starts right after doc 1's tokens
    assert out[3]["global_start"] == SEQ_TOKENS + 10
    assert out[3]["seq_id"] == 1 and out[3]["seq_offset"] == 10


def test_no_global_window_over_docs(spark):
    """The only unpartitioned window runs over the bucket-totals frame (one
    row per PACK_BUCKET docs), never over the doc rows."""
    docs = spark.createDataFrame(
        [(i, "a b") for i in range(200)], "doc_id long, text string"
    )
    plan = token_packing(docs)._jdf.queryExecution().optimizedPlan().toString()
    import re

    unpartitioned = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(" in ln.lower()
        and "bucket#" not in ln.split("windowspecdefinition")[1][:120]
    ]
    # every unpartitioned window spec must sort by bucket (the totals
    # frame), not by doc_id
    for ln in unpartitioned:
        spec = ln.lower().split("windowspecdefinition(")[1]
        assert spec.startswith("bucket"), ln


def test_sequence_manifest_slots(spark):
    from pdf_extractor_spark.operators.packing import sequence_manifest

    rows = [(i, "w " * (17 + i % 13)) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    seqs = sorted(
        sequence_manifest(docs).collect(), key=lambda r: r["seq_id"]
    )
    # gap-free sequence ids; every sequence but the last completely full
    assert [r["seq_id"] for r in seqs] == list(range(len(seqs)))
    for r in seqs[:-1]:
        assert r["n_tokens"] == SEQ_TOKENS
    assert 0 < seqs[-1]["n_tokens"] <= SEQ_TOKENS
    # doc ranges tile without overlap beyond boundary docs
    for a, b in zip(seqs, seqs[1:]):
        assert a["last_doc"] <= b["first_doc"] <= a["last_doc"] + 1


def test_loss_mask_spans_tile_and_alternate(spark):
    from pdf_extractor_spark.operators.packing import (
        loss_mask_spans,
        sequence_manifest,
    )

    rows = [
        (i, "w " * (17 + i % 13), "masked" if i % 3 == 0 else "kept")
        for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    spans = {}
    for r in loss_mask_spans(docs, F.col("source") != "masked").collect():
        spans.setdefault(r["seq_id"], []).append(
            (r["span_start"], r["span_end"], r["trainable"], r["n_docs"])
        )
    fill = {
        r["seq_id"]: r["n_tokens"] for r in sequence_manifest(docs).collect()
    }
    assert set(spans) == set(fill)
    for sid, ss in spans.items():
        ss.sort()
        # spans tile [0, fill) exactly, no gaps or overlap
        assert ss[0][0] == 0 and ss[-1][1] == fill[sid]
        for a, b in zip(ss, ss[1:]):
            assert a[1] == b[0]
        # adjacent spans alternate flags (same-flag runs were merged)
        for a, b in zip(ss, ss[1:]):
            assert a[2] != b[2]


def test_loss_mask_all_trainable_single_span(spark):
    from pdf_extractor_spark.operators.packing import loss_mask_spans

    docs = spark.createDataFrame(
        [(i, "w " * 20, "s") for i in range(40)],
        "doc_id long, text string, source string",
    )
    out = loss_mask_spans(docs, F.lit(True)).collect()
    # one span per sequence, covering everything
    assert all(r["span_start"] == 0 for r in out)
    assert len({r["seq_id"] for r in out}) == len(out)


def test_sequence_shuffle_is_permutation_and_matches_global_rank(spark):
    from pdf_extractor_spark.operators.packing import sequence_shuffle

    seqs = spark.createDataFrame(
        [(i,) for i in range(300)], "seq_id long"
    )
    out = sequence_shuffle(seqs, epoch=0).collect()
    pos = {r["seq_id"]: r["pos"] for r in out}
    assert sorted(pos.values()) == list(range(300))
    # matches the naive single-window global rank over the same key
    import hashlib

    def key(sid, e):
        return hashlib.md5(f"{sid}:{e}".encode()).hexdigest()

    naive = {
        sid: p
        for p, sid in enumerate(
            sorted(range(300), key=lambda s: (key(s, 0), s))
        )
    }
    assert pos == naive


def test_sequence_shuffle_epochs_differ(spark):
    from pdf_extractor_spark.operators.packing import sequence_shuffle

    seqs = spark.createDataFrame([(i,) for i in range(64)], "seq_id long")
    e0 = {r["seq_id"]: r["pos"] for r in sequence_shuffle(seqs, 0).collect()}
    e1 = {r["seq_id"]: r["pos"] for r in sequence_shuffle(seqs, 1).collect()}
    assert e0 != e1
    assert sorted(e0.values()) == sorted(e1.values()) == list(range(64))
    # rerun of the same epoch is byte-identical (content-stable, no RNG)
    again = {r["seq_id"]: r["pos"] for r in sequence_shuffle(seqs, 0).collect()}
    assert again == e0


def test_incremental_packing_equals_one_shot(spark):
    from pdf_extractor_spark.operators.packing import (
        token_packing_incremental,
    )

    rows = [(i, f"tok {'x ' * (i % 9)}") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    one_shot = {
        r["doc_id"]: r for r in token_packing(docs, 16).collect()
    }
    # batch 1: docs < 30; high-water mark = its total token count
    b1 = docs.where("doc_id < 30")
    hwm = sum(
        one_shot[i]["n_tokens"] for i in range(50) if i < 30
    )
    b2 = docs.where("doc_id >= 30")
    incr = {
        r["doc_id"]: r
        for r in token_packing_incremental(b2, hwm, 16).collect()
    }
    for i in range(30, 50):
        for f in ("n_tokens", "global_start", "seq_id", "seq_offset", "n_seqs"):
            assert incr[i][f] == one_shot[i][f], (i, f)
