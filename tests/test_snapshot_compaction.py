"""snapshot_diff classification and compaction_plan bin boundaries."""
from pdf_extractor_spark.operators.warehouse import (
    COMPACT_TARGET_BYTES,
    compaction_plan,
    snapshot_diff,
)


def test_snapshot_diff_classifies(spark):
    v1 = spark.createDataFrame(
        [(1, "same"), (2, "old"), (3, "gone")], "doc_id long, text string"
    )
    v2 = spark.createDataFrame(
        [(1, "same"), (2, "new"), (4, "fresh")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["change"] for r in snapshot_diff(v1, v2).collect()}
    # unchanged row 1 is excluded entirely
    assert out == {2: "update", 3: "delete", 4: "insert"}


def test_compaction_bins_split_at_target(spark):
    t = COMPACT_TARGET_BYTES
    manifest = spark.createDataFrame(
        [
            # part a: three files of 0.6*target -> files 1+2 share bin 0
            # (bytes_before hits 1.2*target at file 3 -> bin 1)
            (1, "a", int(t * 0.6)),
            (2, "a", int(t * 0.6)),
            (3, "a", int(t * 0.6)),
            # part b: an oversize file closes its bin alone
            (1, "b", 3 * t),
            (2, "b", 10),
        ],
        "file_id long, part string, bytes long",
    )
    out = {
        (r["part"], r["bin"]): r for r in compaction_plan(manifest).collect()
    }
    assert out[("a", 0)]["n_files"] == 2
    assert out[("a", 0)]["file_lo"] == 1 and out[("a", 0)]["file_hi"] == 2
    assert out[("a", 1)]["n_files"] == 1
    assert out[("b", 0)]["n_files"] == 1 and out[("b", 0)]["bin_bytes"] == 3 * t
    assert out[("b", 3)]["n_files"] == 1  # next file starts at bin 3*t//t
