"""Product quantization: the fused multi-subspace Lloyd fit and the encode
must match an independent numpy replay exactly (same integer quantization
contract as kmeans_fit)."""
import numpy as np
import pyspark.sql.functions as F

from pdf_extractor_spark.operators.pq import (
    PQ_DS,
    PQ_ITERS,
    PQ_KSUB,
    PQ_M,
    _encoded,
    _subspace_fits,
)
from pdf_extractor_spark.operators.similarity_search import (
    _C_SCALE,
    KMEANS_DIM,
)

N_VECS = 40


def _synth_vq(n=N_VECS):
    """Deterministic integer vectors (already at _VQ_SCALE units)."""
    rows = []
    for i in range(n):
        rows.append(
            [((i * 37 + d * 11) % 41) - 20 for d in range(KMEANS_DIM)]
        )
    return rows


def _np_fits(vq):
    X = np.array(vq, dtype=np.int64)
    fits = []
    for m in range(PQ_M):
        ev = X[:, m * PQ_DS : (m + 1) * PQ_DS]
        cents = ev[:PQ_KSUB] * _C_SCALE
        for _ in range(PQ_ITERS):
            d = ((ev[:, None, :] * _C_SCALE - cents[None]) ** 2).sum(-1)
            asg = d.argmin(1)  # numpy argmin = first/smallest index on ties
            new = cents.copy()
            for c in range(PQ_KSUB):
                pts = ev[asg == c]
                if len(pts):
                    new[c] = np.round(
                        pts.sum(0) * float(_C_SCALE) / len(pts)
                    ).astype(np.int64)
            cents = new
        fits.append(cents)
    return fits


def _np_codes(vq, fits):
    X = np.array(vq, dtype=np.int64)
    out = {}
    for i in range(len(vq)):
        codes, err = [], 0
        for m in range(PQ_M):
            sl = X[i, m * PQ_DS : (m + 1) * PQ_DS]
            d = ((sl[None] * _C_SCALE - fits[m]) ** 2).sum(-1)
            codes.append(int(d.argmin()))
            err += int(d.min())
        out[i] = (codes, err)
    return out


def test_fit_and_encode_match_numpy(spark):
    vq = _synth_vq()
    ev = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vq)],
        "vec_id long, vq array<bigint>",
    ).localCheckpoint(eager=True)
    fits = _subspace_fits(ev)
    np_fits = _np_fits(vq)
    for m in range(PQ_M):
        assert [list(c) for c in np_fits[m]] == [
            [int(v) for v in c] for c in fits[m]
        ], f"subspace {m} centroids diverge"

    enc = _encoded(ev, fits).select(
        "vec_id",
        F.array(*[F.col(f"a{m}.cid") for m in range(PQ_M)]).alias("codes"),
        sum(F.col(f"a{m}.dist") for m in range(PQ_M)).alias("err"),
    )
    got = {
        r["vec_id"]: (list(r["codes"]), r["err"]) for r in enc.collect()
    }
    assert got == _np_codes(vq, np_fits)


def test_codes_bounded_and_seed_vectors_have_zero_iter0_error(spark):
    vq = _synth_vq()
    ev = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vq)],
        "vec_id long, vq array<bigint>",
    ).localCheckpoint(eager=True)
    fits = _subspace_fits(ev)
    enc = _encoded(ev, fits).collect()
    for r in enc:
        for m in range(PQ_M):
            assert 0 <= r[f"a{m}"]["cid"] < PQ_KSUB
            assert r[f"a{m}"]["dist"] >= 0
