"""Product quantization (Jégou et al., PAMI 2011) — the compression half of
the web-scale ANN standard (IVF-PQ): vectors are split into M subspaces, a
small k-means codebook is trained per subspace (the same exact-integer Lloyd
loop as kmeans_fit), and each vector is stored as M one-byte codes. Query
scoring is ADC (asymmetric distance computation): the query precomputes a
distance look-up table per subspace (M x KSUB entries) and any database
vector's approximate distance is M table lookups — no float math per
candidate at all.

Scale shape: codebooks are M x KSUB x DS integers — driver/broadcast-sized
artifacts, exactly like the IVF centroids. Encoding is a pure per-row
expression map over one scan. ADC scoring joins the code frame against the
BROADCAST per-query LUTs on (q_id, code) equi-keys — the corpus never
shuffles — and the per-query top-K is the salted TWO-STAGE rank (partial
min-K per (q_id, salt) partition, final rank over the survivors), so a
query's candidate list never sorts in one task. At 10^9+ vectors the codes
frame is 64x smaller than the raw embeddings, which is the point: the scan
that ADC streams is the compressed one.

Cross-engine determinism: the same integer quantization contract as
kmeans_fit (operators/similarity_search.py) — exact integer distances,
argmin ties to the smaller cid, centroid updates as round(int_sum * 1000.0
/ count). The DuckDB oracle replays every subspace's every Lloyd step.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .similarity_search import (
    _C_SCALE,
    _VQ_SCALE,
    IVF_NPROBE,
    KMEANS_DIM,
    KMEANS_ITERS,
    N_CENTROIDS,
    N_QUERIES,
    _centroid_dist_structs,
    _emb,
    _fit_centroids,
    _nearest_centroid,
    _quantized_vecs,
)

PQ_M = 8            # subspaces
PQ_DS = KMEANS_DIM // PQ_M  # dims per subspace
PQ_KSUB = 16        # codebook entries per subspace
PQ_ITERS = 2        # Lloyd rounds per codebook (mirrors KMEANS_ITERS)
PQ_TOP_K = 3
PQ_RERANK = 60      # ADC shortlist size re-ranked with exact distances
PQ_SALT = 8         # salt width for the two-stage ADC top-K


def _l2(a_col, b_col) -> F.Column:
    """Exact integer squared L2 between a vq slice and a centroid vector
    (centroids are at _C_SCALE extra precision)."""
    return F.aggregate(
        F.zip_with(
            a_col, b_col, lambda a, b: (a * _C_SCALE - b) * (a * _C_SCALE - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _cb_flat(spark: SparkSession, fits: list) -> DataFrame:
    """Codebooks as DATA (m, cid, cvec) — M x KSUB rows. Centroids travel
    as a broadcast row, not plan literals: a literal form at M=8 x KSUB=16
    built ~128 expression trees per select and spent ~10 s/job in Catalyst
    analysis alone (measured); the data form keeps every plan O(1) in the
    codebook size — the assign_broadcast lesson from kmeans_fit."""
    rows = [
        (m, i, [int(v) for v in fits[m][i]])
        for m in range(PQ_M)
        for i in range(PQ_KSUB)
    ]
    return spark.createDataFrame(rows, "m int, cid int, cvec array<bigint>")


def _with_assigns(ev: DataFrame, cb_flat: DataFrame) -> DataFrame:
    """ev plus a{m} = struct(dist, cid) of the nearest subspace-m codebook
    entry, for every m — one 1-row broadcast join (the packed codebook) and
    M small higher-order argmin expressions; ties to the smaller cid via
    lexicographic struct min."""
    packed = cb_flat.agg(
        F.sort_array(F.collect_list(F.struct("m", "cid", "cvec"))).alias("cb")
    )
    out = ev.join(F.broadcast(packed))

    def assign_of(m: int) -> F.Column:
        # closure, never `lambda c, _m=m:` — a 2-arg HOF lambda receives
        # (element, index), so the default arg would capture the INDEX
        sl = F.slice("vq", m * PQ_DS + 1, PQ_DS)
        cands = F.filter("cb", lambda c: c["m"] == F.lit(m))
        return F.array_min(
            F.transform(
                cands,
                lambda c: F.struct(
                    _l2(sl, c["cvec"]).alias("dist"),
                    c["cid"].alias("cid"),
                ),
            )
        )

    for m in range(PQ_M):
        out = out.withColumn(f"a{m}", assign_of(m))
    return out.drop("cb")


def _subspace_fits(ev: DataFrame) -> list:
    """All M Lloyd fits FUSED into one corpus scan per iteration (running
    them via _fit_centroids would cost M x ITERS scans): every row computes
    its M subspace assignments in one select, the update statistics group
    on (subspace, cid, dim) in one aggregate (M x KSUB x DS rows collected
    — codebook-sized driver traffic, the broadcast-Lloyd layout), and empty
    cells keep their previous centroid. Semantics are identical to the
    per-subspace loop (same seeds, same exact-integer argmin and update) —
    the oracle replays each subspace independently and matches.

    Returns M codebooks (each KSUB x DS ints at _VQ_SCALE*_C_SCALE units)."""
    init = (
        ev.where(F.col("vec_id") < PQ_KSUB)
        .orderBy("vec_id")
        .select("vec_id", "vq")
        .collect()
    )
    if [r["vec_id"] for r in init] != list(range(PQ_KSUB)):
        raise ValueError(
            f"pq fits require vec_ids 0..{PQ_KSUB - 1} with "
            f"{KMEANS_DIM}-dim embeddings; got {[r['vec_id'] for r in init]}"
        )
    cents = [
        [
            [v * _C_SCALE for v in r["vq"][m * PQ_DS : (m + 1) * PQ_DS]]
            for r in init
        ]
        for m in range(PQ_M)
    ]
    spark = ev.sparkSession
    for _ in range(PQ_ITERS):
        asg = _with_assigns(ev, _cb_flat(spark, cents)).select(
            "vq", *[F.col(f"a{m}.cid").alias(f"c{m}") for m in range(PQ_M)]
        )
        cid_of_m = F.element_at(
            F.array(*[F.col(f"c{m}") for m in range(PQ_M)]),
            (F.col("d") / PQ_DS).cast("int") + 1,
        )
        stats = (
            asg.select(
                *[f"c{m}" for m in range(PQ_M)],
                F.posexplode("vq").alias("d", "x"),
            )
            .select(
                (F.col("d") / PQ_DS).cast("int").alias("m"),
                cid_of_m.alias("cid"),
                (F.col("d") % PQ_DS).alias("ld"),
                "x",
            )
            .groupBy("m", "cid", "ld")
            .agg(
                F.round(F.sum("x") * float(_C_SCALE) / F.count("*"), 0)
                .cast("long")
                .alias("c")
            )
            .collect()
        )
        upd = {(r["m"], r["cid"], r["ld"]): r["c"] for r in stats}
        cents = [
            [
                [
                    upd.get((m, i, d), cents[m][i][d])
                    for d in range(PQ_DS)
                ]
                for i in range(PQ_KSUB)
            ]
            for m in range(PQ_M)
        ]
    return cents


def _encoded(ev: DataFrame, fits: list) -> DataFrame:
    """Per vector: nearest-codebook struct a{m} = (dist, cid) per subspace —
    one broadcast codebook row + M small argmin expressions over it."""
    return _with_assigns(ev, _cb_flat(ev.sparkSession, fits))


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the M codebooks and encode the corpus: per vector its M
    subspace codes plus the exact integer reconstruction error (the
    quantity PQ training minimizes — sum of the M nearest-centroid
    distances)."""
    ev = _quantized_vecs(_emb(spark, sf_dir)).localCheckpoint(eager=True)
    enc = _encoded(ev, _subspace_fits(ev))
    err = None
    for m in range(PQ_M):
        e = F.col(f"a{m}.dist")
        err = e if err is None else err + e
    return enc.select(
        "vec_id",
        *[
            F.col(f"a{m}.cid").cast("long").alias(f"code{m}")
            for m in range(PQ_M)
        ],
        err.cast("long").alias("recon_err"),
    )


def q_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honest accuracy metric for the full IVF-PQ retrieval layout: ADC
    over the compressed codes builds a PQ_RERANK-candidate shortlist
    (broadcast LUT equi-joins + salted two-stage top-R — the corpus never
    shuffles and no task sorts a query's full candidate list), the
    shortlist alone is re-ranked with exact distances (PQ_RERANK rows per
    query — the standard refine step), and the metric is how many of the
    exact integer-L2 top-K survive. Measured at sf0.01: recall@3 = 0.90
    re-ranked vs 0.20 raw-ADC — the re-rank is what makes the compressed
    scan usable, at PQ_RERANK exact computations per query instead of a
    full-corpus scan.

    Output: q_id, k, n_hits (integers; corpus recall@k = sum/sum)."""
    ev = _quantized_vecs(_emb(spark, sf_dir)).localCheckpoint(eager=True)
    fits = _subspace_fits(ev)
    codes = _encoded(ev, fits).select(
        "vec_id",
        *[F.col(f"a{m}.cid").alias(f"code{m}") for m in range(PQ_M)],
    )
    q_ids = ev.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id")
    )
    cand = codes.crossJoin(F.broadcast(q_ids)).where(
        F.col("vec_id") != F.col("q_id")
    )
    return _recall_from_candidates(ev, fits, cand)


def _recall_from_candidates(
    ev: DataFrame, fits: list, cand: DataFrame
) -> DataFrame:
    """Shared retrieval-quality core: ``cand`` holds (q_id, vec_id,
    code0..code{M-1}) candidate pairs (self-matches already excluded) —
    the full cross product for flat PQ, only the probed cells' members
    for IVF-PQ. ADC-scores them via broadcast LUT equi-joins, takes the
    salted two-stage top-R shortlist, re-ranks the shortlist with exact
    distances, and reports integer recall vs the exact full-corpus
    top-K."""
    spark = ev.sparkSession

    # Per-query, per-subspace distance LUT: M frames of N_QUERIES x KSUB
    # rows — the tiny query side against the broadcast codebook rows.
    queries = ev.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "vq"
    )
    cb = _cb_flat(spark, fits).localCheckpoint(eager=True)
    adc = cand
    for m in range(PQ_M):
        sl = F.slice("vq", m * PQ_DS + 1, PQ_DS)
        lut = queries.join(F.broadcast(cb.where(F.col("m") == m))).select(
            "q_id",
            F.col("cid").alias(f"code{m}"),
            _l2(sl, F.col("cvec")).alias(f"d{m}"),
        )
        adc = adc.join(F.broadcast(lut), ["q_id", f"code{m}"])
    adist = None
    for m in range(PQ_M):
        d = F.col(f"d{m}")
        adist = d if adist is None else adist + d
    scored = adc.select("q_id", "vec_id", adist.alias("adist"))
    # two-stage top-R shortlist: a query's candidate list never sorts in
    # one task (top-R distributes over the salt-partition union)
    w_salt = Window.partitionBy("q_id", "salt").orderBy("adist", "vec_id")
    w_final = Window.partitionBy("q_id").orderBy("adist", "vec_id")
    shortlist = (
        scored.withColumn(
            "salt", F.pmod(F.xxhash64("vec_id"), F.lit(PQ_SALT))
        )
        .withColumn("rk", F.row_number().over(w_salt))
        .where(F.col("rk") <= PQ_RERANK)
        .withColumn("rk2", F.row_number().over(w_final))
        .where(F.col("rk2") <= PQ_RERANK)
        .select("q_id", "vec_id")
    )

    # exact integer-L2 distance form, shared by the re-rank and the truth
    edist = F.aggregate(
        F.zip_with("vq", "qvq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    qside = queries.select("q_id", F.col("vq").alias("qvq"))

    # refine: exact distances on the shortlist only (N_QUERIES x PQ_RERANK
    # rows — the shortlist broadcasts, the corpus side is an equi-join)
    w_rerank = Window.partitionBy("q_id").orderBy("edist", "vec_id")
    approx = (
        ev.join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(qside), "q_id")
        .select("q_id", "vec_id", edist.alias("edist"))
        .withColumn("rk", F.row_number().over(w_rerank))
        .where(F.col("rk") <= PQ_TOP_K)
        .select("q_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )

    # ground truth: exact top-K over the full-precision corpus
    exact_scored = (
        ev.join(F.broadcast(qside), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", edist.alias("edist"))
    )
    w_exact = Window.partitionBy("q_id").orderBy("edist", "vec_id")
    exact = (
        exact_scored.withColumn("rk", F.row_number().over(w_exact))
        .where(F.col("rk") <= PQ_TOP_K)
        .select("q_id", "vec_id")
    )
    return (
        exact.join(F.broadcast(approx), ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count("*").alias("k"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"),
        )
    )


def q_ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed FAISS-style index: the trained coarse quantizer
    (kmeans_fit's exact-integer Lloyd, K=8) restricts each query's
    candidates to its IVF_NPROBE nearest cells, ADC scores only those
    cells' members from the compressed codes, and the exact re-rank
    refines the shortlist. Measured at sf0.01: recall@3 = 0.93 while
    ADC-scoring ~37% of the corpus (vs flat PQ's 0.90 over 100%) — the
    cells concentrate true neighbors, which is the entire IVF bet.

    Scale shape: cell membership and probes come from broadcast-centroid
    assignment (no shuffle), candidates from a broadcast equi-join on the
    cell id, and everything downstream is the shared bounded machinery.

    Output: q_id, k, n_hits."""
    ev = _quantized_vecs(_emb(spark, sf_dir)).localCheckpoint(eager=True)
    coarse = _fit_centroids(ev)
    fits = _subspace_fits(ev)
    codes = (
        _encoded(ev, fits)
        .withColumn("cell", _nearest_centroid(coarse)["cid"])
        .select(
            "vec_id",
            "cell",
            *[F.col(f"a{m}.cid").alias(f"code{m}") for m in range(PQ_M)],
        )
    )
    probes = (
        ev.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(
                F.slice(
                    F.sort_array(_centroid_dist_structs(coarse)),
                    1,
                    IVF_NPROBE,
                )
            ).alias("p"),
        )
        .select("q_id", F.col("p.cid").alias("cell"))
    )
    cand = (
        codes.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            *[f"code{m}" for m in range(PQ_M)],
        )
    )
    return _recall_from_candidates(ev, fits, cand)


# ---------------------------------------------------------------------------
# Oracles: per-subspace replay of every Lloyd step (the kmeans_fit CTE form,
# parameterized by the subspace's dim offset), then encode / ADC in SQL. The
# IVF-PQ oracle adds the coarse quantizer's own Lloyd replay and restricts
# candidates to the probed cells.
# ---------------------------------------------------------------------------


def _subspace_chain(m: int) -> str:
    """CTEs ev{m} (subspace slice), s{m}c0..s{m}c{PQ_ITERS} (Lloyd states),
    and s{m}enc (final per-vector nearest: vec_id, cid, dist)."""
    lo, hi = m * PQ_DS, (m + 1) * PQ_DS
    parts = [f"""
        , ev{m} AS (
            SELECT vec_id, d - {lo} AS d, x FROM evall
            WHERE d >= {lo} AND d < {hi}
        ), s{m}c0 AS (
            SELECT vec_id::INT AS cid, d, x * {_C_SCALE} AS c
            FROM ev{m} WHERE vec_id < {PQ_KSUB}
        )"""]
    for it in range(1, PQ_ITERS + 1):
        parts.append(f"""
        , s{m}dist{it} AS (
            SELECT e.vec_id, c.cid,
                   sum((e.x * {_C_SCALE} - c.c) * (e.x * {_C_SCALE} - c.c))
                       ::BIGINT AS dist
            FROM ev{m} e JOIN s{m}c{it - 1} c ON e.d = c.d
            GROUP BY 1, 2
        ), s{m}asg{it} AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rk
            FROM s{m}dist{it}
        ), s{m}stats{it} AS (
            SELECT a.cid, e.d,
                   round(sum(e.x) * {_C_SCALE}.0 / count(*))::BIGINT AS c
            FROM s{m}asg{it} a JOIN ev{m} e ON a.vec_id = e.vec_id
            WHERE a.rk = 1
            GROUP BY 1, 2
        ), s{m}c{it} AS (
            SELECT p.cid, p.d, coalesce(s.c, p.c) AS c
            FROM s{m}c{it - 1} p
            LEFT JOIN s{m}stats{it} s ON s.cid = p.cid AND s.d = p.d
        )""")
    last = PQ_ITERS
    parts.append(f"""
        , s{m}distF AS (
            SELECT e.vec_id, c.cid,
                   sum((e.x * {_C_SCALE} - c.c) * (e.x * {_C_SCALE} - c.c))
                       ::BIGINT AS dist
            FROM ev{m} e JOIN s{m}c{last} c ON e.d = c.d
            GROUP BY 1, 2
        ), s{m}enc AS (
            SELECT vec_id, cid, dist FROM (
                SELECT vec_id, cid, dist,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rk
                FROM s{m}distF
            ) WHERE rk = 1
        )""")
    return "".join(parts)


_EVALL = f"""
        WITH evall AS (
            SELECT vec_id, r.d AS d,
                   round(embedding[r.d + 1]::DOUBLE * {_VQ_SCALE}.0)::BIGINT
                       AS x
            FROM embeddings,
                 LATERAL (SELECT unnest(range({KMEANS_DIM})) AS d) r
            WHERE len(embedding) = {KMEANS_DIM}
        )"""


def _pq_codes_oracle() -> str:
    chains = "".join(_subspace_chain(m) for m in range(PQ_M))
    joins = "".join(
        f" JOIN s{m}enc e{m} ON e{m}.vec_id = e0.vec_id"
        for m in range(1, PQ_M)
    )
    codes = ", ".join(f"e{m}.cid::BIGINT AS code{m}" for m in range(PQ_M))
    err = " + ".join(f"e{m}.dist" for m in range(PQ_M))
    return (
        _EVALL + chains
        + f"""
        SELECT e0.vec_id, {codes}, ({err})::BIGINT AS recon_err
        FROM s0enc e0{joins}
    """
    )


def _luts_sql() -> str:
    """Per-query, per-subspace LUTs against the trained codebooks."""
    return "".join(
        f"""
        , lut{m} AS (
            SELECT e.vec_id AS q_id, c.cid,
                   sum((e.x * {_C_SCALE} - c.c) * (e.x * {_C_SCALE} - c.c))
                       ::BIGINT AS dm
            FROM ev{m} e JOIN s{m}c{PQ_ITERS} c ON e.d = c.d
            WHERE e.vec_id < {N_QUERIES}
            GROUP BY 1, 2
        )"""
        for m in range(PQ_M)
    )


def _codes_cte() -> str:
    code_joins = "".join(
        f" JOIN s{m}enc e{m} ON e{m}.vec_id = e0.vec_id"
        for m in range(1, PQ_M)
    )
    codes_cols = ", ".join(f"e{m}.cid AS code{m}" for m in range(PQ_M))
    return f"""
        , codes AS (
            SELECT e0.vec_id, {codes_cols} FROM s0enc e0{code_joins}
        )"""


def _recall_tail() -> str:
    """short -> rerank -> atop -> exact truth -> per-query recall; expects
    an ``adc`` CTE of (q_id, vec_id, adist)."""
    return f"""
        , short AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id,
                       row_number() OVER (PARTITION BY q_id
                                          ORDER BY adist, vec_id) AS rk
                FROM adc
            ) WHERE rk <= {PQ_RERANK}
        ), rerank AS (
            SELECT s.q_id, s.vec_id,
                   sum((e.x - q.x) * (e.x - q.x))::BIGINT AS edist
            FROM short s
            JOIN evall e ON e.vec_id = s.vec_id
            JOIN evall q ON q.vec_id = s.q_id AND q.d = e.d
            GROUP BY 1, 2
        ), atop AS (
            SELECT q_id, vec_id, 1 AS hit FROM (
                SELECT q_id, vec_id,
                       row_number() OVER (PARTITION BY q_id
                                          ORDER BY edist, vec_id) AS rk
                FROM rerank
            ) WHERE rk <= {PQ_TOP_K}
        ), ex AS (
            SELECT q.vec_id AS q_id, e.vec_id,
                   sum((e.x - q.x) * (e.x - q.x))::BIGINT AS edist
            FROM evall e
            JOIN evall q ON q.d = e.d AND q.vec_id < {N_QUERIES}
                        AND e.vec_id <> q.vec_id
            GROUP BY 1, 2
        ), etop AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id,
                       row_number() OVER (PARTITION BY q_id
                                          ORDER BY edist, vec_id) AS rk
                FROM ex
            ) WHERE rk <= {PQ_TOP_K}
        )
        SELECT t.q_id, count(*) AS k,
               sum(coalesce(a.hit, 0))::BIGINT AS n_hits
        FROM etop t
        LEFT JOIN atop a ON a.q_id = t.q_id AND a.vec_id = t.vec_id
        GROUP BY t.q_id
    """


_ADIST = " + ".join(f"l{m}.dm" for m in range(PQ_M))
_LUT_JOINS = "".join(
    f" JOIN lut{m} l{m} ON l{m}.cid = co.code{m}"
    + (f" AND l{m}.q_id = l0.q_id" if m else "")
    for m in range(PQ_M)
)


def _pq_adc_recall_oracle() -> str:
    chains = "".join(_subspace_chain(m) for m in range(PQ_M))
    return (
        _EVALL + chains + _luts_sql() + _codes_cte()
        + f"""
        , adc AS (
            SELECT l0.q_id, co.vec_id, ({_ADIST})::BIGINT AS adist
            FROM codes co{_LUT_JOINS}
            WHERE co.vec_id <> l0.q_id
        )"""
        + _recall_tail()
    )


def _coarse_chain() -> str:
    """The coarse quantizer's Lloyd replay over the FULL dimension (the
    kmeans_fit recipe: seeds = vec_ids 0..N_CENTROIDS-1, KMEANS_ITERS
    rounds), ending in per-vector cell assignment and per-query probes."""
    parts = [f"""
        , gc0 AS (
            SELECT vec_id::INT AS cid, d, x * {_C_SCALE} AS c
            FROM evall WHERE vec_id < {N_CENTROIDS}
        )"""]
    for it in range(1, KMEANS_ITERS + 1):
        parts.append(f"""
        , gdist{it} AS (
            SELECT e.vec_id, c.cid,
                   sum((e.x * {_C_SCALE} - c.c) * (e.x * {_C_SCALE} - c.c))
                       ::BIGINT AS dist
            FROM evall e JOIN gc{it - 1} c ON e.d = c.d
            GROUP BY 1, 2
        ), gasg{it} AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rk
            FROM gdist{it}
        ), gstats{it} AS (
            SELECT a.cid, e.d,
                   round(sum(e.x) * {_C_SCALE}.0 / count(*))::BIGINT AS c
            FROM gasg{it} a JOIN evall e ON a.vec_id = e.vec_id
            WHERE a.rk = 1
            GROUP BY 1, 2
        ), gc{it} AS (
            SELECT p.cid, p.d, coalesce(s.c, p.c) AS c
            FROM gc{it - 1} p
            LEFT JOIN gstats{it} s ON s.cid = p.cid AND s.d = p.d
        )""")
    parts.append(f"""
        , gdistF AS (
            SELECT e.vec_id, c.cid,
                   sum((e.x * {_C_SCALE} - c.c) * (e.x * {_C_SCALE} - c.c))
                       ::BIGINT AS dist
            FROM evall e JOIN gc{KMEANS_ITERS} c ON e.d = c.d
            GROUP BY 1, 2
        ), grk AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rk
            FROM gdistF
        ), cellasg AS (
            SELECT vec_id, cid FROM grk WHERE rk = 1
        ), qprobe AS (
            SELECT vec_id AS q_id, cid FROM grk
            WHERE vec_id < {N_QUERIES} AND rk <= {IVF_NPROBE}
        ), cand AS (
            SELECT p.q_id, a.vec_id
            FROM cellasg a JOIN qprobe p ON p.cid = a.cid
            WHERE a.vec_id <> p.q_id
        )""")
    return "".join(parts)


def _ivfpq_recall_oracle() -> str:
    chains = "".join(_subspace_chain(m) for m in range(PQ_M))
    return (
        _EVALL + chains + _luts_sql() + _codes_cte() + _coarse_chain()
        + f"""
        , adc AS (
            SELECT ca.q_id, ca.vec_id, ({_ADIST})::BIGINT AS adist
            FROM cand ca
            JOIN codes co ON co.vec_id = ca.vec_id{_LUT_JOINS}
            WHERE l0.q_id = ca.q_id
        )"""
        + _recall_tail()
    )


QUERIES = {
    "pq_codes": q_pq_codes,
    "pq_adc_recall": q_pq_adc_recall,
    "ann_ivfpq_recall": q_ann_ivfpq_recall,
}
ORACLES = {
    "pq_codes": _pq_codes_oracle(),
    "pq_adc_recall": _pq_adc_recall_oracle(),
    "ann_ivfpq_recall": _ivfpq_recall_oracle(),
}
