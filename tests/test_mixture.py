"""Deterministic domain-mixture resampling: feasibility cap, target
arithmetic, stable membership, exclusion of unweighted sources."""
import pyspark.sql.functions as F

from pdf_extractor_spark.operators.text_ops import mixture_resample


def _docs(spark, per_source):
    rows = []
    i = 0
    for src, n in per_source.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_binding_source_caps_total(spark):
    # src_b has 10 docs at 50% weight -> N = 20; src_a's 100 docs cap at 200.
    docs = _docs(spark, {"src_a": 100, "src_b": 10})
    out = {
        r["source"]: r
        for r in mixture_resample(
            docs, {"src_a": 50, "src_b": 50}
        ).collect()
    }
    assert out["src_a"]["n_target"] == 10
    assert out["src_b"]["n_target"] == 10
    for r in out.values():
        assert r["n_target"] <= r["n_available"]
        assert r["n_kept"] <= r["n_available"]


def test_unweighted_source_dropped(spark):
    docs = _docs(spark, {"src_a": 20, "src_zzz": 20})
    out = mixture_resample(docs, {"src_a": 100}).collect()
    assert {r["source"] for r in out} == {"src_a"}
    # weight 100, only source -> every doc is its own cap: all kept.
    assert out[0]["n_target"] == out[0]["n_available"] == 20
    assert out[0]["n_kept"] == 20


def test_membership_is_stable_across_runs(spark):
    docs = _docs(spark, {"src_a": 60, "src_b": 40})
    w = {"src_a": 60, "src_b": 40}
    a = sorted(mixture_resample(docs, w).collect())
    b = sorted(mixture_resample(docs, w).collect())
    assert a == b


def test_kept_close_to_target(spark):
    # Hash thresholding is binomial-noise exact-rate: at 300 docs / 50%
    # rate the kept count must land well inside 6 sigma of the target.
    docs = _docs(spark, {"src_a": 300, "src_b": 150})
    out = {
        r["source"]: r
        for r in mixture_resample(docs, {"src_a": 67, "src_b": 33}).collect()
    }
    for r in out.values():
        n, t = r["n_kept"], r["n_target"]
        sigma = (t * 0.5) ** 0.5 + 1
        assert abs(n - t) < 6 * sigma, (r["source"], n, t)
