"""Z-order (Morton-curve) data layout with MEASURED data-skipping benefit —
the Delta/Iceberg `OPTIMIZE ZORDER BY` technique: interleave the bits of two
filter dimensions so file-level min/max stats prune multi-dimensional
predicates, not just the leading sort key.

At 100 TB the layout IS the optimization: a time-sorted table answers
time-range queries with perfect pruning but scans everything for a user
slice; the z-curve trades a little pruning on each dimension for pruning on
BOTH. This operator computes the 20-bit Morton code as a pure integer
expression (replayed bit-for-bit by the oracle), assigns rows to
Z_FILES z-range "files", simulates Parquet min/max pruning for a fixed
2-D probe box under (a) the z-layout and (b) a time-linear layout, and
reports files/rows touched by each — the honest-metrics measurement of why
you would rewrite a 100 TB table this way.

Everything integer: bit interleave via shift/and/or sums, bucket ids via
floor division of non-negative codes.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

Z_BITS = 10          # per-dimension bits -> 20-bit Morton code
Z_FILES = 64         # simulated file count (z-range splits)
# fixed probe box: a user slice over a time window
U_LO, U_HI = 100, 200      # u in [U_LO, U_HI)
T_LO, T_HI = 256, 512      # t in [T_LO, T_HI)

_DIM = 1 << Z_BITS
_FILE_SPAN = (_DIM * _DIM) // Z_FILES       # z-codes per z-file
_T_SPAN = _DIM // Z_FILES                   # t values per linear file


def _morton_terms(u: str, t: str, shift_fmt: str) -> str:
    """Sum of interleaved bit terms; shift_fmt renders one shifted bit for
    the target engine (fields: expr, k, out)."""
    terms = []
    for k in range(Z_BITS):
        terms.append(shift_fmt.format(expr=u, k=k, out=2 * k))
        terms.append(shift_fmt.format(expr=t, k=k, out=2 * k + 1))
    return " + ".join(terms)


_SPARK_BIT = "shiftleft(shiftright({expr}, {k}) & 1, {out})"
# full outer parens are load-bearing: DuckDB binds + tighter than <<, so an
# unparenthesized term chain would cascade the shifts into an overflow
_DUCK_BIT = "(((({expr}) >> {k}) & 1) << {out})"


def zorder_code(u: str, t: str) -> F.Column:
    return F.expr(_morton_terms(u, t, _SPARK_BIT)).cast("long")


def q_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One summary row: files/rows touched by the probe box under the
    z-order layout vs the time-linear layout, over the same Z_FILES file
    count. Touch decision = file min/max ranges intersect the box on BOTH
    dimensions (exactly what Parquet row-group stats give a scan).

    Scale shape: the code is a pure map; per-file stats are one
    hash-groupBy onto Z_FILES groups; the verdict is an aggregate over
    Z_FILES rows. In production the z-file id is the repartitionByRange /
    write-ordering key — this query measures the payoff without writing."""
    from . import load

    ev = load(spark, sf_dir, "events").selectExpr(
        f"user_id % {_DIM} AS u",
        "timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast(ts as timestamp_ntz)) % {_DIM} AS t",
    )
    coded = ev.select(
        "u",
        "t",
        zorder_code("u", "t").alias("zcode"),
    ).select(
        "u",
        "t",
        F.expr(f"div(zcode, {_FILE_SPAN})").alias("zfile"),
        F.expr(f"div(t, {_T_SPAN})").alias("tfile"),
    )

    def stats(file_col: str) -> DataFrame:
        return coded.groupBy(file_col).agg(
            F.count("*").alias("n_rows"),
            F.min("u").alias("min_u"),
            F.max("u").alias("max_u"),
            F.min("t").alias("min_t"),
            F.max("t").alias("max_t"),
        )

    touched = (
        (F.col("max_u") >= U_LO)
        & (F.col("min_u") < U_HI)
        & (F.col("max_t") >= T_LO)
        & (F.col("min_t") < T_HI)
    )

    def verdict(file_col: str, prefix: str) -> DataFrame:
        return stats(file_col).agg(
            F.count("*").alias(f"{prefix}_files"),
            F.sum(touched.cast("long")).alias(f"{prefix}_files_touched"),
            F.sum(
                F.when(touched, F.col("n_rows")).otherwise(0)
            ).alias(f"{prefix}_rows_touched"),
        )

    total = coded.agg(
        F.count("*").alias("n_rows_total"),
        F.sum(
            (
                (F.col("u") >= U_LO) & (F.col("u") < U_HI)
                & (F.col("t") >= T_LO) & (F.col("t") < T_HI)
            ).cast("long")
        ).alias("n_rows_matching"),
    )
    return (
        verdict("zfile", "z")
        .crossJoin(F.broadcast(verdict("tfile", "t")))
        .crossJoin(F.broadcast(total))
    )


QUERIES = {"zorder_skipping": q_zorder_skipping}

_DUCK_Z = _morton_terms("u", "t", _DUCK_BIT)

ORACLES = {
    "zorder_skipping": f"""
        WITH coded AS (
            SELECT u, t,
                   ({_DUCK_Z}) // {_FILE_SPAN} AS zfile,
                   t // {_T_SPAN} AS tfile
            FROM (
                SELECT user_id % {_DIM} AS u,
                       (epoch_us(ts) // 3600000000) % {_DIM} AS t
                FROM events
            )
        ), zs AS (
            SELECT zfile, count(*) AS n_rows,
                   min(u) AS min_u, max(u) AS max_u,
                   min(t) AS min_t, max(t) AS max_t
            FROM coded GROUP BY zfile
        ), ts_ AS (
            SELECT tfile, count(*) AS n_rows,
                   min(u) AS min_u, max(u) AS max_u,
                   min(t) AS min_t, max(t) AS max_t
            FROM coded GROUP BY tfile
        ), zv AS (
            SELECT count(*) AS z_files,
                   sum((max_u >= {U_LO} AND min_u < {U_HI}
                        AND max_t >= {T_LO} AND min_t < {T_HI})::BIGINT
                   )::BIGINT AS z_files_touched,
                   sum(CASE WHEN max_u >= {U_LO} AND min_u < {U_HI}
                             AND max_t >= {T_LO} AND min_t < {T_HI}
                            THEN n_rows ELSE 0 END)::BIGINT
                       AS z_rows_touched
            FROM zs
        ), tv AS (
            SELECT count(*) AS t_files,
                   sum((max_u >= {U_LO} AND min_u < {U_HI}
                        AND max_t >= {T_LO} AND min_t < {T_HI})::BIGINT
                   )::BIGINT AS t_files_touched,
                   sum(CASE WHEN max_u >= {U_LO} AND min_u < {U_HI}
                             AND max_t >= {T_LO} AND min_t < {T_HI}
                            THEN n_rows ELSE 0 END)::BIGINT
                       AS t_rows_touched
            FROM ts_
        ), tot AS (
            SELECT count(*) AS n_rows_total,
                   sum((u >= {U_LO} AND u < {U_HI}
                        AND t >= {T_LO} AND t < {T_HI})::BIGINT
                   )::BIGINT AS n_rows_matching
            FROM coded
        )
        SELECT * FROM zv, tv, tot
    """,
}
