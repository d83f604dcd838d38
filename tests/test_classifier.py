"""Logistic-regression quality classifier: independent Python replay of the
integer GD spec + distillation accuracy on the driver corpus."""
import hashlib

from pdf_extractor_spark.operators import classifier as clf


def _py_fit(texts, iters=clf.N_ITERS):
    feats, ys = {}, {}
    for doc_id, text in texts:
        ws = [w for w in __import__("re").split(r"\s+", text) if w]
        ys[doc_id] = 1 if len(ws) >= clf.MIN_WORDS else 0
        f = {}
        for w in ws:
            d = int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % 64
            f[d] = f.get(d, 0) + 1
        f[clf.BIAS_DIM] = clf.BIAS_VAL
        feats[doc_id] = f

    def sig(z):
        zc = max(-clf.ZMAX, min(clf.ZMAX, z))
        return clf.SIGMOID_LUT[(zc + clf.ZMAX) // clf.LUT_STEP]

    n = len(texts)
    w = {d: 0 for d in range(-1, 64)}
    for t in range(iters):
        g = {d: 0 for d in w}
        for doc_id, f in feats.items():
            z = sum(w[d] * v for d, v in f.items())
            e = 1000 * ys[doc_id] - sig(z)
            for d, v in f.items():
                g[d] += v * e
        den = n * 1000 * (1 + t)
        for d in w:
            gv = g[d]
            # negate AFTER the floor division (the spec's sign-split);
            # -x // den would floor the negated numerator instead
            if gv >= 0:
                w[d] += (gv * clf.LR_NUM) // den
            else:
                w[d] -= ((-gv) * clf.LR_NUM) // den
    return w


def test_matches_python_replay(spark):
    texts = [
        (i, " ".join(f"tok{j % 17}" for j in range(20 + (i * 13) % 70)))
        for i in range(40)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.dim: r.w for r in clf.logreg_fit(df).collect()
    }
    want = _py_fit(texts)
    assert got == want


def test_distills_the_length_gate(spark):
    rows = clf.q_logreg_quality(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 65
    m = rows[0]
    assert m.n_docs == 500
    assert m.acc_permille >= 950  # measured 986 at this sf
    weights = {r.dim: r.w for r in rows}
    # the gate is "total words >= 50": every evidence weight should pull
    # positive on average and the intercept negative
    assert weights[clf.BIAS_DIM] < 0
    assert sum(v for d, v in weights.items() if d >= 0) > 0
