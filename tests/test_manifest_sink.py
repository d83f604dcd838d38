"""Custom transactional sink (sources/synthlog.py ManifestSinkWriter):
manifest-last publish, zero-row staging cleanup, overwrite honoring."""
import json
import os

from pdf_extractor_spark.sources.synthlog import register_sink


def _write(spark, df, path, mode):
    (df.write.format("manifest_sink").option("path", path).mode(mode).save())


def _manifest(path):
    with open(os.path.join(path, "manifest.json")) as fh:
        return json.load(fh)


def _part_files(path):
    return sorted(f for f in os.listdir(path) if f.startswith("part-"))


def test_manifest_publish_and_staging_cleanup(spark, tmp_path):
    register_sink(spark)
    out = str(tmp_path / "sink")
    # 4 partitions, one guaranteed empty (ids 0..9 into 4 ranges after a
    # filter that wipes range [5,8)) -> a zero-row staged file must not
    # survive into the manifest or the directory.
    df = spark.range(0, 10, 1, 4).where("id < 5 or id >= 8")
    _write(spark, df, out, "append")
    m = _manifest(out)
    assert m["total_rows"] == 7
    assert sum(f["n_rows"] for f in m["files"]) == 7
    # directory state == manifest state, staging debris removed
    assert _part_files(out) == sorted(f["file"] for f in m["files"])
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_manifest_overwrite_drops_stale_parts(spark, tmp_path):
    register_sink(spark)
    out = str(tmp_path / "sink")
    _write(spark, spark.range(0, 100, 1, 8), out, "append")
    assert _manifest(out)["total_rows"] == 100
    wide = _part_files(out)
    assert len(wide) == 8
    # overwrite with FEWER partitions: the extra old part files must go,
    # or a directory-listing reader would see 100 old rows + 20 new ones.
    _write(spark, spark.range(0, 20, 1, 2), out, "overwrite")
    m = _manifest(out)
    assert m["total_rows"] == 20
    assert _part_files(out) == sorted(f["file"] for f in m["files"])
    assert len(_part_files(out)) == 2
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_overwrite_crash_window_keeps_old_manifest_valid(spark, tmp_path):
    """Crash injected between part-publish and manifest swap (commit()
    runs in a separate Python worker, so the injection is filesystem
    state: manifest.json.tmp pre-created as a directory fails the
    manifest write AFTER the new versioned parts moved in). The OLD
    manifest and every file it references must survive untouched —
    the exact torn-overwrite window the versioned-part commit order
    closes."""
    import shutil

    import pytest

    register_sink(spark)
    out = str(tmp_path / "sink")
    _write(spark, spark.range(0, 20, 1, 2), out, "overwrite")
    m_before = _manifest(out)
    assert m_before["total_rows"] == 20
    os.makedirs(os.path.join(out, "manifest.json.tmp"))
    with pytest.raises(Exception, match="IsADirectory|Is a directory"):
        _write(spark, spark.range(0, 50, 1, 4), out, "overwrite")
    shutil.rmtree(os.path.join(out, "manifest.json.tmp"))
    # commit point never reached: old manifest intact, all its files present
    assert _manifest(out) == m_before
    for f in m_before["files"]:
        assert os.path.exists(os.path.join(out, f["file"]))
    # retry publishes a fresh version and sweeps the crashed attempt's parts
    _write(spark, spark.range(0, 50, 1, 4), out, "overwrite")
    m_after = _manifest(out)
    assert m_after["total_rows"] == 50
    assert m_after["version"] > m_before["version"]
    assert _part_files(out) == sorted(f["file"] for f in m_after["files"])
