"""Distributed linear quality classifier: full-batch logistic regression
trained over hashed text features — the fastText-style quality-filter slot
(GPT-3/LLaMA-class pipelines gate web documents with exactly this model
shape: hashed bag-of-words -> linear -> sigmoid). The training target here
is a Gopher-style length gate (y = 1 iff the document has >= 50 words), so
the fit is a measurable DISTILLATION: the linear model must rediscover the
rule from hashed counts alone, and the output carries its exact training
accuracy (the ann_recall honest-metrics pattern; measured 0.97-0.98 across
sf0.001/0.01/0.1).

Engine-exact training: gradient descent needs the sigmoid — transcendental,
so floats would diverge across engines. The spec is fully integer:

- weights carry fixed-point values at WSCALE = 1e6 (w_real = w / WSCALE)
- the logit z = sum_j w_j * x_ij is an exact integer at WSCALE; the bias
  feature has value BIAS_VAL = 50 (the gate threshold) rather than 1 —
  scaling the intercept to the data direction conditions full-batch GD
  (with value 1 the intercept/sum-direction curvature gap stalls it)
- sigmoid comes from a 65-entry permille LUT over clamped 0.25-wide logit
  bins; the LUT is computed once in Python and embedded as the SAME
  literal list in both engines (quantized sigmoid — the fixed-point
  inference trick, applied to training)
- Robbins-Monro decay: step t divides by (1 + t); the update is
  dw_j = sign(g_j) * (|g_j| * LR_NUM) div (n * 1000 * (1 + t)), with
  g_j = sum_i x_ij * (1000*y_i - sigma_permille_i). The sign-split is
  load-bearing: Spark's integer `div` truncates toward zero while DuckDB's
  `//` floors, so a negative numerator must never reach either operator.

The DuckDB oracle replays all N_ITERS iterations as a CTE chain (the
kmeans_fit / bpe_fit pattern). Production would train float weights (SGD
tolerates drift); the integer spec is what makes a distributed ITERATIVE
fit oracle-checkable.

Scale shape: the feature frame (sparse (doc, dim, val) + bias rows +
label) is localCheckpoint-ed ONCE and reused every iteration; per
iteration: one broadcast join of the 65-row weight frame onto the
features, one doc-keyed sum (the logit), one doc-keyed join back, one
dim-keyed sum (the gradient) — map-side combined, no windows, no Python,
no driver collect of anything data-sized.
"""
from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .text_analysis import HASH_DIM

WSCALE = 10**6
ZMAX = 8 * WSCALE          # logits clamp to [-8, 8]
LUT_STEP = WSCALE // 4     # 0.25-wide bins -> 65 entries
LR_NUM = 1_000_000         # lr = 1.0 at WSCALE (decayed by 1/(1+t))
N_ITERS = 20
BIAS_DIM = -1
BIAS_VAL = 50              # intercept feature scaled to the gate threshold
MIN_WORDS = 50             # y = 1 iff the doc has >= MIN_WORDS words

SIGMOID_LUT = [
    round(1000 / (1 + math.exp(-(-8 + 0.25 * t)))) for t in range(65)
]

_LUT_SPARK = "array(" + ", ".join(str(v) for v in SIGMOID_LUT) + ")"
_LUT_DUCK = "[" + ", ".join(str(v) for v in SIGMOID_LUT) + "]"

# sigma_permille from a scaled-logit column z (identical semantics in both
# engines: clamp FIRST so the division never sees a negative numerator)
_SIG_SPARK = (
    f"element_at({_LUT_SPARK}, cast(div(greatest(-{ZMAX}, "
    f"least({ZMAX}, z)) + {ZMAX}, {LUT_STEP}) AS int) + 1)"
)
_SIG_DUCK = (
    f"{_LUT_DUCK}[(greatest(-{ZMAX}, least({ZMAX}, z)) + {ZMAX})"
    f" // {LUT_STEP} + 1]"
)


# The negate-AFTER-divide order is load-bearing (see module docstring).
def _upd_spark(g: str, n_docs: int, t: int) -> str:
    den = n_docs * 1000 * (1 + t)
    return (
        f"w + (CASE WHEN {g} >= 0 "
        f"THEN div(({g}) * {LR_NUM}, {den}) "
        f"ELSE -div((-({g})) * {LR_NUM}, {den}) END)"
    )


def _upd_duck(g: str, t: int) -> str:
    den_tail = f"* 1000 * {1 + t}"
    return (
        f"w + (CASE WHEN {g} >= 0 "
        f"THEN (({g}) * {LR_NUM}) // (n_docs {den_tail}) "
        f"ELSE -(((-({g})) * {LR_NUM}) // (n_docs {den_tail})) END)"
    )


def _hashed_features(docs: DataFrame) -> DataFrame:
    """Sparse hashed-TF count rows + a scaled bias row per doc (dim = -1),
    with the length-gate label. Unsigned counts (not the signed variant of
    q_hashed_tf_vectors): the sign trick zero-means collision noise for
    inner products, but a classifier wants raw evidence counts."""
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("ws"),
    )
    labeled = toks.select(
        "doc_id",
        "ws",
        (F.size("ws") >= MIN_WORDS).cast("long").alias("y"),
    )
    words = labeled.select(
        "doc_id", "y", F.explode("ws").alias("w")
    )
    dim = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("long")
        % HASH_DIM
    )
    tf = (
        words.select("doc_id", "y", dim.alias("dim"))
        .groupBy("doc_id", "y", "dim")
        .agg(F.count("*").alias("val"))
    )
    bias = labeled.select(
        "doc_id",
        "y",
        F.lit(BIAS_DIM).cast("long").alias("dim"),
        F.lit(BIAS_VAL).cast("long").alias("val"),
    )
    return tf.unionByName(bias)


def _doc_sigma(feats: DataFrame, w_frame: DataFrame) -> DataFrame:
    """Per-doc logit + LUT sigmoid under a given weight frame."""
    return (
        feats.join(F.broadcast(w_frame), "dim")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("val") * F.col("w")).alias("z"))
        .withColumn("sig", F.expr(_SIG_SPARK))
    )


def _fit_weights(feats: DataFrame, n_docs: int, iters: int) -> DataFrame:
    """The GD loop over a localCheckpointed feature frame -> final weight
    frame (dim, w)."""
    spark = feats.sparkSession
    weights = spark.range(-1, HASH_DIM).select(
        F.col("id").alias("dim"), F.lit(0).cast("long").alias("w")
    ).localCheckpoint(eager=True)
    for t in range(iters):
        errs = _doc_sigma(feats, weights).select(
            "doc_id", (F.lit(1000) * F.col("y") - F.col("sig")).alias("e")
        )
        grads = (
            feats.join(errs, "doc_id")
            .groupBy("dim")
            .agg(F.sum(F.col("val") * F.col("e")).alias("g"))
        )
        weights = (
            weights.join(grads, "dim", "left")
            .select(
                "dim",
                F.expr(
                    _upd_spark("coalesce(g, 0L)", n_docs, t)
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return weights


def logreg_fit(docs: DataFrame, iters: int = N_ITERS) -> DataFrame:
    """(dim, w, n_correct, n_docs, acc_permille): the trained fixed-point
    weights (bias at dim = -1) with the final training accuracy repeated
    on every row (single-schema output for the oracle gate)."""
    feats = _hashed_features(docs).localCheckpoint(eager=True)
    n_docs = docs.count()
    weights = _fit_weights(feats, n_docs, iters)
    metrics = _doc_sigma(feats, weights).agg(
        F.sum(
            ((F.col("sig") >= 500).cast("long") == F.col("y")).cast("long")
        ).alias("n_correct"),
        F.count("*").alias("n_docs"),
    ).select(
        "n_correct",
        "n_docs",
        F.expr("div(n_correct * 1000, n_docs)").alias("acc_permille"),
    )
    return weights.crossJoin(F.broadcast(metrics)).select(
        "dim", "w", "n_correct", "n_docs", "acc_permille"
    )


def q_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load

    return logreg_fit(load(spark, sf_dir, "documents"))


QUERIES = {"logreg_quality": q_logreg_quality}


def _oracle_chain() -> str:
    """Shared DuckDB CTE chain: features -> N_ITERS weight updates ->
    ``final`` (per-doc logit under the trained weights). Both the fit
    oracle and the calibration oracle append their own select."""
    feats = f"""
        toks AS (
            SELECT doc_id, list_filter(
                       regexp_split_to_array(text, '\\s+'),
                       x -> x <> '') AS ws
            FROM documents
        ), labeled AS (
            SELECT doc_id, ws, (len(ws) >= {MIN_WORDS})::BIGINT AS y
            FROM toks
        ), tf AS (
            SELECT doc_id, y,
                   ('0x' || substring(md5(w), 1, 4))::BIGINT % {HASH_DIM}
                       AS dim,
                   count(*) AS val
            FROM (SELECT doc_id, y, unnest(ws) AS w FROM labeled)
            GROUP BY 1, 2, 3
        ), feats AS MATERIALIZED (
            -- MATERIALIZED is load-bearing: 20 iterations reference feats
            -- twice each; inlined, DuckDB re-opens the parquet per
            -- reference and trips the fd limit
            SELECT doc_id, y, dim, val FROM tf
            UNION ALL
            SELECT doc_id, y, {BIAS_DIM}, {BIAS_VAL} FROM labeled
        ), nn AS (SELECT count(*) AS n_docs FROM documents),
        w0 AS (
            SELECT unnest(range({BIAS_DIM}, {HASH_DIM})) AS dim,
                   0::BIGINT AS w
        )"""
    steps = []
    for i in range(N_ITERS):
        steps.append(f"""
        e{i} AS (
            SELECT doc_id, 1000 * y - {_SIG_DUCK} AS e
            FROM (
                SELECT doc_id, y, sum(val * w)::BIGINT AS z
                FROM feats JOIN w{i} USING (dim)
                GROUP BY doc_id, y
            )
        ), g{i} AS (
            SELECT dim, sum(val * e)::BIGINT AS g
            FROM feats JOIN e{i} USING (doc_id) GROUP BY dim
        ), w{i + 1} AS MATERIALIZED (
            -- each w is referenced twice (next err + next update):
            -- inlined, the chain would expand 2^N_ITERS times
            SELECT w{i}.dim,
                   ({_upd_duck(f"coalesce(g{i}.g, 0)", i)})::BIGINT AS w
            FROM w{i} LEFT JOIN g{i} ON w{i}.dim = g{i}.dim, nn
        )""")
    return "WITH " + feats + "," + ",".join(steps) + f""",
        final AS (
            SELECT doc_id, y, sum(val * w)::BIGINT AS z
            FROM feats JOIN w{N_ITERS} USING (dim)
            GROUP BY doc_id, y
        )"""


def _oracle() -> str:
    return _oracle_chain() + f""", m AS (
            SELECT sum(((({_SIG_DUCK}) >= 500)::BIGINT = y)::BIGINT)::BIGINT
                       AS n_correct,
                   count(*) AS n_docs
            FROM final
        )
        SELECT dim, w, n_correct, n_docs,
               (n_correct * 1000 // m.n_docs)::BIGINT AS acc_permille
        FROM w{N_ITERS}, m
    """


N_CAL_BINS = 10


def classifier_calibration(docs: DataFrame, iters: int = N_ITERS) -> DataFrame:
    """Reliability-diagram bins for the trained classifier — the
    honest-metrics companion to its accuracy (the ann_recall pattern
    applied to probabilities): a quality filter that is ACCURATE but
    mis-CALIBRATED silently skews any pipeline that thresholds or
    importance-weights on its scores. Predicted permille probabilities
    land in N_CAL_BINS equal bins (the 1000-permille point folds into the
    top bin); per bin: count, positives, mean predicted confidence, the
    empirical positive frequency, and |confidence - frequency| — the
    per-bin term of Expected Calibration Error (Guo et al., ICML 2017),
    all integer permille so both engines agree exactly.

    Scale shape: one extra per-doc sigma pass over the already-trained
    weights (a broadcast join + doc-keyed sum) and a 10-key hash
    aggregate — nothing beyond what the fit itself already does per
    iteration."""
    feats = _hashed_features(docs).localCheckpoint(eager=True)
    weights = _fit_weights(feats, docs.count(), iters)
    sig = _doc_sigma(feats, weights)
    binned = sig.select(
        F.least(
            F.expr(f"div(sig, {1000 // N_CAL_BINS})"),
            F.lit(N_CAL_BINS - 1),
        ).cast("long").alias("bin"),
        "y",
        "sig",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("sig").alias("sum_sig"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("div(sum_sig, n)").alias("conf_permille"),
            F.expr("div(n_pos * 1000, n)").alias("freq_permille"),
            F.abs(
                F.expr("div(sum_sig, n) - div(n_pos * 1000, n)")
            ).alias("gap_permille"),
        )
    )


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load

    return classifier_calibration(load(spark, sf_dir, "documents"))


def _calibration_oracle() -> str:
    w = 1000 // N_CAL_BINS
    return _oracle_chain() + f""", sig AS (
            SELECT doc_id, y, {_SIG_DUCK} AS sig FROM final
        ), b AS (
            SELECT least(sig // {w}, {N_CAL_BINS - 1})::BIGINT AS bin,
                   count(*) AS n,
                   sum(y)::BIGINT AS n_pos,
                   sum(sig)::BIGINT AS sum_sig
            FROM sig GROUP BY 1
        )
        SELECT bin, n, n_pos,
               (sum_sig // n)::BIGINT AS conf_permille,
               (n_pos * 1000 // n)::BIGINT AS freq_permille,
               abs(sum_sig // n - n_pos * 1000 // n)::BIGINT
                   AS gap_permille
        FROM b
    """


QUERIES["classifier_calibration"] = q_classifier_calibration

ORACLES = {
    "logreg_quality": _oracle(),
    "classifier_calibration": _calibration_oracle(),
}
