"""Warehouse-maintenance operators: SCD Type-2 dimension history and
right-to-be-forgotten (GDPR) erasure propagation with an audit trail —
the table-maintenance jobs every production lakehouse runs beside its
analytics.

Both are pure DataFrame constructions with per-user-bounded windows or
key-anti-joins — nothing here shuffles more than once per keyed step.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

TIER_WIDTH_CENTS = 10_000   # purchase-value cents per tier step
OPEN_END = -1               # valid_to sentinel for the current row
PURGE_MOD = 37              # deletion list fixture: user_id % 37 == 0


def _ep(col: str = "ts") -> F.Column:
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast({col} as timestamp_ntz))"
    )


def scd2_history(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension (type 2) history of each user's purchase
    tier: one row per tier EPISODE with [valid_from, valid_to) bounds and
    an is_current flag. Change detection is lag() over the user's ordered
    purchases (keep rows where the tier differs from the previous one);
    episode close is lead() over the kept change rows. Two per-user
    windows, both bounded by the user's own history — the standard
    distributed SCD2 build, no cross-user traffic at all."""
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            _ep().alias("ep"),
            F.expr(
                f"div(CAST(round(value * 100) AS long), {TIER_WIDTH_CENTS})"
            ).alias("tier"),
        )
    )
    changes = (
        purchases.withColumn("prev_tier", F.lag("tier").over(w))
        .where(
            F.col("prev_tier").isNull()
            | (F.col("tier") != F.col("prev_tier"))
        )
        .select("user_id", "event_id", "ep", "tier")
    )
    w2 = Window.partitionBy("user_id").orderBy("ep", "event_id")
    nxt = F.lead("ep").over(w2)
    return changes.select(
        "user_id",
        "tier",
        F.col("ep").alias("valid_from_us"),
        F.coalesce(nxt - 1, F.lit(OPEN_END)).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


def q_scd2_user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load

    return scd2_history(load(spark, sf_dir, "events"))


def q_purge_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation, audited: a deletion list (fixture:
    every PURGE_MOD-th user) anti-joins the event stream; the output is the
    audit row a compliance job must emit — users requested, users actually
    present, rows deleted, rows kept, and a verification count proving no
    purged user survives in the kept set (must be 0 by construction, but
    the audit MEASURES it rather than assuming).

    Scale shape: the deletion list is orders smaller than the stream —
    broadcast anti-join, one scan, no shuffle of the big side."""
    from . import load

    ev = load(spark, sf_dir, "events")
    requests = (
        ev.select("user_id").distinct()
        .where(F.col("user_id") % PURGE_MOD == 0)
    )
    kept = ev.join(F.broadcast(requests), "user_id", "left_anti")
    leaked = kept.join(F.broadcast(requests), "user_id", "left_semi")
    stats = ev.agg(
        F.count("*").alias("n_events_before"),
        F.countDistinct("user_id").alias("n_users_before"),
    )
    return (
        stats.crossJoin(
            F.broadcast(requests.agg(F.count("*").alias("n_purge_users")))
        )
        .crossJoin(
            F.broadcast(kept.agg(F.count("*").alias("n_events_after")))
        )
        .crossJoin(
            F.broadcast(leaked.agg(F.count("*").alias("n_leaked")))
        )
        .select(
            "n_events_before",
            "n_users_before",
            "n_purge_users",
            "n_events_after",
            (F.col("n_events_before") - F.col("n_events_after")).alias(
                "n_events_deleted"
            ),
            "n_leaked",
        )
    )


# --- snapshot diff (table-version CDC) --------------------------------------
# Two snapshots of the documents table are synthesized deterministically:
#   v1 = docs except doc_id % INS_MOD == INS_REM (absent -> inserts in v2)
#   v2 = docs except doc_id % DEL_MOD == DEL_REM (absent -> deletes),
#        with text revised for doc_id % UPD_MOD == UPD_REM (-> updates)
INS_MOD, INS_REM = 11, 3
DEL_MOD, DEL_REM = 13, 5
UPD_MOD, UPD_REM = 7, 2


def snapshot_diff(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """CDC between two keyed table versions: one full-outer equi-join on the
    key, rows classified insert / delete / update by key presence and a
    content digest compare; unchanged rows are excluded (the CDC read of an
    Iceberg MERGE). Expects (doc_id, text) frames.

    Scale shape: the only shuffle is the key-equi full-outer join (two
    scans, one exchange each); the digest compare is a pure map. Change
    volume, not table size, bounds the output."""
    a = v1.select("doc_id", F.md5("text").alias("old_digest"))
    b = v2.select("doc_id", F.md5("text").alias("new_digest"))
    joined = a.join(b, "doc_id", "full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("insert"))
        .when(F.col("new_digest").isNull(), F.lit("delete"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select("doc_id", "change", "old_digest", "new_digest")
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = docs.where(F.col("doc_id") % INS_MOD != INS_REM)
    v2 = docs.where(F.col("doc_id") % DEL_MOD != DEL_REM).select(
        "doc_id",
        F.when(
            F.col("doc_id") % UPD_MOD == UPD_REM,
            F.concat(F.col("text"), F.lit(" [rev2]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(v1, v2)


# --- compaction planning (small-file bin packing) ----------------------------
# The OPTIMIZE/rewrite_data_files planner: group each partition's small files
# into target-size rewrite bins. The file manifest is synthesized from the
# documents table (file_id = doc_id, partition = source, bytes = n_chars) —
# manifests are metadata, orders below data scale, which is why a bounded
# per-partition window is the honest production shape here.
COMPACT_TARGET_BYTES = 4000


def compaction_plan(manifest: DataFrame) -> DataFrame:
    """Per (partition, bin): file count, total bytes, and the file-id range
    to rewrite together. Bin assignment is the running-sum rule — files in
    deterministic file_id order, bin = floor(bytes_before / target) — so
    every bin except a partition's last holds >= target bytes once closed.

    The window partitions by the table partition and orders by file_id:
    state is one partition's manifest rows (metadata scale). Files at or
    above the target land alone in their bin-range and are naturally
    rewritten solo (or skipped by a size predicate upstream)."""
    w = (
        Window.partitionBy("part")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("bytes").over(w), F.lit(0))
    binned = manifest.withColumn(
        "bin", (before / COMPACT_TARGET_BYTES).cast("long")
    )
    return binned.groupBy("part", "bin").agg(
        F.count("*").alias("n_files"),
        F.sum("bytes").alias("bin_bytes"),
        F.min("file_id").alias("file_lo"),
        F.max("file_id").alias("file_hi"),
    )


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load

    manifest = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("file_id"),
        F.col("source").alias("part"),
        F.col("n_chars").cast("long").alias("bytes"),
    )
    return compaction_plan(manifest)


# --- k-anonymity audit --------------------------------------------------------
# Quasi-identifier combination (event_type, weekday, value band): any
# combination shared by fewer than K_ANON distinct users re-identifies those
# users — the audit every release-for-research job runs before publishing.
K_ANON = 5
VALUE_BAND_CENTS = 2_000  # value quantized to $20 bands


def k_anonymity_audit(events: DataFrame) -> DataFrame:
    """Per quasi-identifier group: its distinct-user count and whether it
    violates k-anonymity (fewer than K_ANON users share the combination).
    Weekday is the engine-neutral epoch-day form (olap.py's _WD idiom) —
    never an engine's own dayofweek(), whose week-start conventions differ.

    Scale shape: one hash-groupBy on the quasi-id tuple with a distinct-user
    count (two-phase: partial distinct on (quasi-id, user) then count) —
    group cardinality is the quasi-id domain product, orders below the
    event stream. No windows, no joins."""
    from ..functions.expressions import floordiv_sql
    from .aggregates import _with_ep
    from .olap import _DAY_US, _WD_SHIFT

    wd = F.expr(f"pmod({floordiv_sql('ep', _DAY_US)} + {_WD_SHIFT}, 7)").cast(
        "int"
    )
    q = _with_ep(events).select(
        F.col("event_type").alias("qi_type"),
        wd.alias("qi_weekday"),
        F.expr(
            f"div(CAST(round(value * 100) AS long), {VALUE_BAND_CENTS})"
        ).alias("qi_band"),
        "user_id",
    )
    return (
        q.groupBy("qi_type", "qi_weekday", "qi_band")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .withColumn("violates", F.col("n_users") < K_ANON)
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load

    return k_anonymity_audit(load(spark, sf_dir, "events"))


QUERIES = {
    "scd2_user_tiers": q_scd2_user_tiers,
    "purge_users": q_purge_users,
    "snapshot_diff": q_snapshot_diff,
    "compaction_plan": q_compaction_plan,
    "k_anonymity": q_k_anonymity,
}

ORACLES = {
    "scd2_user_tiers": f"""
        WITH p AS (
            SELECT user_id, event_id, epoch_us(ts) AS ep,
                   round(value * 100)::BIGINT // {TIER_WIDTH_CENTS} AS tier
            FROM events WHERE event_type = 'purchase'
        ), ch AS (
            SELECT user_id, event_id, ep, tier
            FROM (
                SELECT *, lag(tier) OVER
                       (PARTITION BY user_id ORDER BY ep, event_id)
                       AS prev_tier
                FROM p
            )
            WHERE prev_tier IS NULL OR tier <> prev_tier
        )
        SELECT user_id, tier,
               ep AS valid_from_us,
               coalesce(lead(ep) OVER
                   (PARTITION BY user_id ORDER BY ep, event_id) - 1,
                   {OPEN_END}) AS valid_to_us,
               (lead(ep) OVER
                   (PARTITION BY user_id ORDER BY ep, event_id) IS NULL)
                   AS is_current
        FROM ch
    """,
    "purge_users": f"""
        WITH req AS (
            SELECT DISTINCT user_id FROM events
            WHERE user_id % {PURGE_MOD} = 0
        ), kept AS (
            SELECT * FROM events
            WHERE user_id NOT IN (SELECT user_id FROM req)
        )
        SELECT (SELECT count(*) FROM events) AS n_events_before,
               (SELECT count(DISTINCT user_id) FROM events)
                   AS n_users_before,
               (SELECT count(*) FROM req) AS n_purge_users,
               (SELECT count(*) FROM kept) AS n_events_after,
               (SELECT count(*) FROM events)
                   - (SELECT count(*) FROM kept) AS n_events_deleted,
               (SELECT count(*) FROM kept
                WHERE user_id IN (SELECT user_id FROM req)) AS n_leaked
    """,
    "snapshot_diff": f"""
        WITH v1 AS (
            SELECT doc_id, md5(text) AS old_digest FROM documents
            WHERE doc_id % {INS_MOD} <> {INS_REM}
        ), v2 AS (
            SELECT doc_id,
                   md5(CASE WHEN doc_id % {UPD_MOD} = {UPD_REM}
                            THEN text || ' [rev2]' ELSE text END)
                       AS new_digest
            FROM documents
            WHERE doc_id % {DEL_MOD} <> {DEL_REM}
        ), j AS (
            SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
                   v1.old_digest, v2.new_digest
            FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        )
        SELECT doc_id,
               CASE WHEN old_digest IS NULL THEN 'insert'
                    WHEN new_digest IS NULL THEN 'delete'
                    ELSE 'update' END AS change,
               old_digest, new_digest
        FROM j
        WHERE old_digest IS NULL OR new_digest IS NULL
              OR old_digest <> new_digest
    """,
    "compaction_plan": f"""
        WITH m AS (
            SELECT doc_id AS file_id, source AS part,
                   n_chars::BIGINT AS bytes
            FROM documents
        ), b AS (
            SELECT part, file_id, bytes,
                   coalesce(sum(bytes) OVER (
                       PARTITION BY part ORDER BY file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0)::BIGINT // {COMPACT_TARGET_BYTES} AS bin
            FROM m
        )
        SELECT part, bin, count(*) AS n_files,
               sum(bytes)::BIGINT AS bin_bytes,
               min(file_id) AS file_lo, max(file_id) AS file_hi
        FROM b GROUP BY 1, 2
    """,
}


def _k_anonymity_oracle() -> str:
    from ..functions.expressions import floordiv_duck
    from .olap import _DAY_US, _WD_SHIFT

    wd = f"((({floordiv_duck('epoch_us(ts)', _DAY_US)} + {_WD_SHIFT}) % 7 + 7) % 7)"
    return f"""
        WITH q AS (
            SELECT event_type AS qi_type,
                   {wd}::INT AS qi_weekday,
                   round(value * 100)::BIGINT // {VALUE_BAND_CENTS}
                       AS qi_band,
                   user_id
            FROM events
        )
        SELECT qi_type, qi_weekday, qi_band,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events,
               count(DISTINCT user_id) < {K_ANON} AS violates
        FROM q GROUP BY 1, 2, 3
    """


ORACLES["k_anonymity"] = _k_anonymity_oracle()


# --- Semi-structured JSON extraction profile -----------------------------------
JSON_CENTS_MIN_VALUE = 5.0  # rows at or below this omit the cents field


def q_json_extract_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion: a nested JSON event envelope is
    synthesized in-plan with ``to_json`` (id, type, optional cents, a tags
    array — nullable fields vary by row, the way joins.py synthesizes
    cells from part), then parsed BACK with JVM-side ``get_json_object``
    path extraction and profiled per event type: field-presence counts,
    an id round-trip fidelity count, and typed min/max/sum over the
    extracted values. This is the landing-zone audit every JSON ingest
    runs before committing a schema: which fields are present how often,
    do the types parse, do the keys survive.

    The oracle is deliberately NOT a string comparison: DuckDB computes
    the expected extraction results directly from the base columns, so
    the query only matches if Spark's construct-then-parse pipeline is
    semantically lossless (null fields omitted by to_json surface as
    NULL paths; array indexing and long casts round-trip exactly).

    Scale shape: construction + parsing are pure per-row JVM projections
    (zero Python, zero shuffle); the profile is one map-side-combined
    groupBy over a 5-value type domain. Output: event_type, n, n_id_ok,
    n_cents, sum_cents, min_tag, max_tag."""
    from . import load

    ev = load(spark, sf_dir, "events")
    cents = F.when(
        F.col("value") > JSON_CENTS_MIN_VALUE,
        F.round(F.col("value") * 100).cast("long"),
    )
    js = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("type"),
            cents.alias("cents"),
            F.array(
                F.col("user_id"), F.pmod(F.col("user_id"), F.lit(7))
            ).alias("tags"),
        )
    )
    p = ev.select("event_type", "event_id", js.alias("js")).select(
        "event_type",
        "event_id",
        F.get_json_object("js", "$.id").cast("long").alias("jid"),
        F.get_json_object("js", "$.cents").cast("long").alias("jcents"),
        F.get_json_object("js", "$.tags[1]").cast("long").alias("jtag"),
    )
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("jid") == F.col("event_id")).cast("long")).alias(
            "n_id_ok"
        ),
        F.count("jcents").alias("n_cents"),
        F.sum("jcents").alias("sum_cents"),
        F.min("jtag").alias("min_tag"),
        F.max("jtag").alias("max_tag"),
    )


QUERIES["json_extract_profile"] = q_json_extract_profile

ORACLES["json_extract_profile"] = f"""
    SELECT event_type,
           count(*)::BIGINT AS n,
           count(*)::BIGINT AS n_id_ok,
           (count(*) FILTER (WHERE value > {JSON_CENTS_MIN_VALUE}))::BIGINT
               AS n_cents,
           (sum(round(value * 100)::BIGINT)
                FILTER (WHERE value > {JSON_CENTS_MIN_VALUE}))::BIGINT
               AS sum_cents,
           min(((user_id % 7) + 7) % 7)::BIGINT AS min_tag,
           max(((user_id % 7) + 7) % 7)::BIGINT AS max_tag
    FROM events GROUP BY event_type
"""


# --- Data-quality expectation suite --------------------------------------------
EXPECT_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
EXPECT_VALUE_MAX = 1000.0


def q_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectation suite (Schelter et al.,
    VLDB'18 — public AWS research): declarative constraints evaluated as
    aggregates, one verdict row per check with the raw numerator/
    denominator, an integer permille, and a passed flag:

      completeness_props   props is never NULL
      uniqueness_event_id  event_id is unique (exact distinct count)
      domain_event_type    event_type within the accepted domain
      range_value          value within [0, EXPECT_VALUE_MAX]
      ri_orders_customer   every orders.o_custkey exists in customer

    Scale shape: the four row-level checks fold into ONE aggregate pass
    over events (a single scan no matter how many checks — the Deequ
    trick), unpivoted to rows with ``stack``; the referential check is a
    broadcast LEFT ANTI join on the dimension (missing keys counted, not
    listed). Exact countDistinct shuffles one row per distinct key; at
    10^12 rows swap in approx_count_distinct and a tolerance, or keep
    exact — it is one hash groupBy either way. Output: check_name, num,
    den, permille, passed."""
    from . import load

    ev = load(spark, sf_dir, "events")
    dom = ", ".join(f"'{t}'" for t in EXPECT_EVENT_TYPES)
    a = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("props").alias("c_props"),
        F.countDistinct("event_id").alias("u_eid"),
        F.sum(
            F.col("event_type").isin(*EXPECT_EVENT_TYPES).cast("long")
        ).alias("c_dom"),
        F.sum(
            (
                (F.col("value") >= 0) & (F.col("value") <= EXPECT_VALUE_MAX)
            ).cast("long")
        ).alias("c_rng"),
    )
    row_checks = a.select(
        F.expr(
            "stack(4,"
            " 'completeness_props', c_props,"
            " 'uniqueness_event_id', u_eid,"
            " 'domain_event_type', c_dom,"
            " 'range_value', c_rng) as (check_name, num)"
        ),
        F.col("n").alias("den"),
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    missing = (
        orders.join(
            F.broadcast(cust),
            orders.o_custkey == cust.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_missing"))
    )
    ri = (
        orders.agg(F.count(F.lit(1)).alias("den"))
        .crossJoin(F.broadcast(missing))
        .select(
            F.lit("ri_orders_customer").alias("check_name"),
            (F.col("den") - F.col("n_missing")).alias("num"),
            "den",
        )
    )
    return row_checks.unionByName(ri).select(
        "check_name",
        "num",
        "den",
        F.expr("num * 1000 div den").alias("permille"),
        F.expr("cast(num = den as bigint)").alias("passed"),
    )


QUERIES["expectation_suite"] = q_expectation_suite

ORACLES["expectation_suite"] = f"""
    WITH a AS (
        SELECT count(*)::BIGINT AS n,
               count(props)::BIGINT AS c_props,
               count(DISTINCT event_id)::BIGINT AS u_eid,
               (count(*) FILTER (WHERE event_type IN
                   ('click', 'view', 'purchase', 'signup', 'error')
               ))::BIGINT AS c_dom,
               (count(*) FILTER (WHERE value >= 0
                    AND value <= {EXPECT_VALUE_MAX}))::BIGINT AS c_rng
        FROM events
    ), ri AS (
        SELECT 'ri_orders_customer' AS check_name,
               (count(*) FILTER (WHERE c.c_custkey IS NOT NULL))::BIGINT
                   AS num,
               count(*)::BIGINT AS den
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ), rows_ AS (
        SELECT 'completeness_props' AS check_name, c_props AS num, n AS den
        FROM a
        UNION ALL
        SELECT 'uniqueness_event_id', u_eid, n FROM a
        UNION ALL
        SELECT 'domain_event_type', c_dom, n FROM a
        UNION ALL
        SELECT 'range_value', c_rng, n FROM a
        UNION ALL
        SELECT check_name, num, den FROM ri
    )
    SELECT check_name, num, den,
           num * 1000 // den AS permille,
           (num = den)::BIGINT AS passed
    FROM rows_
"""


# --- Ingest-coverage gap audit (backfill planner) -------------------------------
COVERAGE_EPOCH = "2024-01-01"


def q_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-coverage audit / backfill planner: for every user, which
    days inside the corpus's global [min_day, max_day] window have NO
    events, compressed into contiguous gap runs — the exact list a
    backfill scheduler consumes (n missing partitions, how many distinct
    holes, the longest outage). Users with full coverage emit no row.

    Scale shape: the expected spine is users x sequence(lo, hi) — one
    explode per user keyed by a 1-row broadcast bounds aggregate, linear
    in users x days (never a per-day query loop); missing cells come from
    one left-anti equi-join against the distinct present pairs; runs
    compress via the classic day - row_number() grouping (one keyed
    window, no iteration). At 10^12 rows the spine stays proportional to
    |keys| x |days| — the partition catalog, not the fact data.

    Output: user_id, n_missing_days, n_gap_runs, longest_gap."""
    from pyspark.sql import Window
    from . import load

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit(COVERAGE_EPOCH).cast("date")
        )
        .cast("long")
        .alias("day"),
    )
    present = ev.distinct()
    bounds = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    users = ev.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    missing = spine.join(present, ["user_id", "day"], "left_anti")
    w = Window.partitionBy("user_id").orderBy("day")
    runs = missing.withColumn(
        "grp", F.col("day") - F.row_number().over(w)
    )
    per_run = runs.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    return per_run.groupBy("user_id").agg(
        F.sum("len").alias("n_missing_days"),
        F.count(F.lit(1)).alias("n_gap_runs"),
        F.max("len").alias("longest_gap"),
    )


QUERIES["coverage_gaps"] = q_coverage_gaps

ORACLES["coverage_gaps"] = f"""
    WITH d AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '{COVERAGE_EPOCH}', ts::DATE)::BIGINT
                   AS day
        FROM events
    ), b AS (
        SELECT min(day) AS lo, max(day) AS hi FROM d
    ), spine AS (
        SELECT u.user_id, s.day
        FROM (SELECT DISTINCT user_id FROM d) u, b,
             LATERAL (SELECT unnest(range(b.lo, b.hi + 1)) AS day) s
    ), miss AS (
        SELECT sp.user_id, sp.day
        FROM spine sp LEFT JOIN d
          ON d.user_id = sp.user_id AND d.day = sp.day
        WHERE d.user_id IS NULL
    ), runs AS (
        SELECT user_id, day,
               day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS grp
        FROM miss
    ), per_run AS (
        SELECT user_id, grp, count(*)::BIGINT AS len
        FROM runs GROUP BY 1, 2
    )
    SELECT user_id, sum(len)::BIGINT AS n_missing_days,
           count(*)::BIGINT AS n_gap_runs, max(len)::BIGINT AS longest_gap
    FROM per_run GROUP BY user_id
"""


# --- SCD2 point-in-time (AS OF) reconstruction ----------------------------------
# 2024-01-15 12:00:00 UTC in epoch microseconds: mid-corpus, so episodes
# both before and after the instant exist.
SCD2_ASOF_US = 1_705_320_000_000_000


def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 dimension: the state of every user's
    tier AS OF a fixed instant — the query a reproducible-training-run
    audit asks ("which tier was this user in when the snapshot shipped").
    A row qualifies when its [valid_from, valid_to] episode covers the
    instant (open episodes via the OPEN_END sentinel); users whose first
    purchase is later emit nothing, by definition of the dimension.

    Scale shape: the history build is the scd2_user_tiers plan (two
    per-user windows, no cross-user traffic); the as-of filter is a pure
    predicate on the episode bounds — at warehouse scale it prunes to
    ~|keys| rows regardless of history depth. Output: user_id, tier,
    valid_from_us."""
    from . import load

    hist = scd2_history(load(spark, sf_dir, "events"))
    asof = F.lit(SCD2_ASOF_US)
    return hist.where(
        (F.col("valid_from_us") <= asof)
        & (
            (F.col("valid_to_us") == OPEN_END)
            | (F.col("valid_to_us") >= asof)
        )
    ).select("user_id", "tier", "valid_from_us")


QUERIES["scd2_asof"] = q_scd2_asof

ORACLES["scd2_asof"] = f"""
    SELECT user_id, tier, valid_from_us
    FROM ({{scd2}}) h
    WHERE valid_from_us <= {SCD2_ASOF_US}
      AND (valid_to_us = {OPEN_END} OR valid_to_us >= {SCD2_ASOF_US})
""".format(scd2=ORACLES["scd2_user_tiers"])


# --- Column-level profile ---------------------------------------------------------
PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile — the discovery half of the Deequ pair
    (expectation_suite is the checker; this is what you run FIRST to
    decide which checks to write): one row per column with row count,
    null count, exact distinct count, and min/max computed on the RAW
    column then rendered as strings (one schema fits every column type;
    rendering before aggregating would silently turn numeric min/max
    lexicographic — '998' > '10000'). ts renders in full ISO micros;
    value through integer cents so both engines print identically (raw
    double repr differs across engines).

    Scale shape: ALL columns profile in ONE aggregate pass over the scan
    (count + conditional counts + min/max are plain aggregates;
    count(DISTINCT col) per column plans as one Expand + hash aggregate —
    the multi-distinct form Spark executes with partial aggregation),
    then a stack to rows. At 10^12 rows swap exact distinct for
    approx_count_distinct per column — same single-pass shape.

    Output: col_name, n_rows, n_null, n_distinct, min_s, max_s."""
    from . import load

    ev = load(spark, sf_dir, "events")

    def render(c, agg):
        if c == "ts":
            return F.date_format(agg, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        if c == "value":
            return F.round(agg * 100).cast("long").cast("string")
        return agg.cast("string")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"),
            F.countDistinct(c).alias(f"dist_{c}"),
            render(c, F.min(F.col(c))).alias(f"min_{c}"),
            render(c, F.max(F.col(c))).alias(f"max_{c}"),
        ]
    one = ev.agg(*aggs)
    stack = ", ".join(
        f"'{c}', null_{c}, dist_{c}, min_{c}, max_{c}"
        for c in PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack})"
            " as (col_name, n_null, n_distinct, min_s, max_s)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")


QUERIES["column_profile"] = q_column_profile


def _column_profile_oracle() -> str:
    def render(c, agg):
        if c == "ts":
            return f"strftime({agg}, '%Y-%m-%d %H:%M:%S.%f')"
        if c == "value":
            return f"round({agg} * 100)::BIGINT::VARCHAR"
        return f"{agg}::VARCHAR"

    parts = []
    for c in PROFILE_COLS:
        parts.append(f"""
        SELECT '{c}' AS col_name, count(*)::BIGINT AS n_rows,
               (count(*) - count({c}))::BIGINT AS n_null,
               count(DISTINCT {c})::BIGINT AS n_distinct,
               {render(c, f'min({c})')} AS min_s,
               {render(c, f'max({c})')} AS max_s
        FROM events""")
    return "\nUNION ALL\n".join(parts)


ORACLES["column_profile"] = _column_profile_oracle()


# --- Incremental join-view maintenance ---------------------------------------------
JOINVIEW_CUT = "1999-01-01"  # orders before this are the base; rest are the delta


def q_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN-aggregate view — the MV-delta
    algebra rollup_incremental proves for plain aggregates, extended
    across a join: the view is revenue per nation (orders |X| customer
    |X| nation), the orders table splits into a base and a delta batch at
    a date cut, and the maintained result is base-partials MERGED with
    delta-partials — where the delta only ever joins the (static,
    broadcast) dimensions: DELTA(A) |X| B, never a recompute of A |X| B.
    The oracle computes the view directly from everything, so a green row
    IS the maintenance-equals-recompute invariant.

    Scale shape: the delta path costs O(|delta|) join+agg work per batch;
    partials merge on the tiny view key (nation). n_from_delta carries
    provenance — the freshness audit a production MV publishes.

    Output: n_name, n_orders, sum_cents, n_from_delta."""
    from . import load

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def partials(part: DataFrame, from_delta: int) -> DataFrame:
        return (
            part.join(F.broadcast(cust), part.o_custkey == cust.c_custkey)
            .join(
                F.broadcast(nation),
                cust.c_nationkey == nation.n_nationkey,
            )
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).alias("sum_cents"),
            )
            .withColumn(
                "n_from_delta",
                F.lit(from_delta) * F.col("n_orders"),
            )
        )

    base = partials(
        orders.where(F.col("o_orderdate") < JOINVIEW_CUT), 0
    )
    delta = partials(
        orders.where(F.col("o_orderdate") >= JOINVIEW_CUT), 1
    )
    return (
        base.unionByName(delta)
        .groupBy("n_name")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
            F.sum("n_from_delta").alias("n_from_delta"),
        )
    )


QUERIES["join_view_delta"] = q_join_view_delta

ORACLES["join_view_delta"] = f"""
    SELECT n_name,
           count(*)::BIGINT AS n_orders,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents,
           (count(*) FILTER (
                WHERE o_orderdate >= TIMESTAMP '{JOINVIEW_CUT} 00:00:00'
           ))::BIGINT AS n_from_delta
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


# --- Partition integrity digests -----------------------------------------------------
def q_partition_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evident partition digests — the cross-system integrity
    manifest a migration or replication job publishes: per (event_type,
    day) partition, the row count plus ORDER-INDEPENDENT content digests
    (sum and xor of a per-row 32-bit hash over the business fields). Two
    stores agree on a partition iff all three numbers agree, regardless
    of row order, file split, or engine — exactly what a parquet
    re-encode, a lakehouse migration, or a DR copy needs to prove. The
    per-row hash is the first 8 md5 hex chars of a canonical field
    serialization, so any engine can recompute it.

    Scale shape: a pure per-row projection plus one map-side-combined
    groupBy; both digests are commutative-associative aggregates, so
    partial aggregation is exact. The BIGINT sum accumulator is safe to
    ~2^31 rows per partition (32-bit values); past that, decimal(38,0)
    (documented, not needed here). Output: event_type, day, n_rows,
    digest_sum, digest_xor."""
    from . import load

    ev = load(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit(COVERAGE_EPOCH).cast("date")
    ).cast("long")
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("event_id").cast("string"),
                    F.col("event_type"),
                    F.round(F.col("value") * 100).cast("long").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        ev.select("event_type", day.alias("day"), row_hash.alias("h"))
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").alias("digest_sum"),
            F.expr("bit_xor(h)").alias("digest_xor"),
        )
    )


QUERIES["partition_digest"] = q_partition_digest

ORACLES["partition_digest"] = f"""
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '{COVERAGE_EPOCH}', ts::DATE)::BIGINT
                   AS day,
               ('0x' || substring(md5(
                    event_id::VARCHAR || ':' || event_type || ':'
                    || round(value * 100)::BIGINT::VARCHAR
               ), 1, 8))::BIGINT AS h
        FROM events
    )
    SELECT event_type, day, count(*)::BIGINT AS n_rows,
           sum(h)::BIGINT AS digest_sum,
           bit_xor(h)::BIGINT AS digest_xor
    FROM d GROUP BY 1, 2
"""


# --- Effective-dated (temporal) dimension join ---------------------------------------
def q_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The effective-dated dimension join — the production reason SCD2
    history exists: every fact row (event) joins the dimension episode
    whose [valid_from, valid_to] covers the EVENT's own timestamp, so an
    event is attributed to the tier the user was in THEN, not the tier
    they hold now (joining is_current would silently rewrite history).
    Events before the user's first episode land in tier -1 (the
    pre-dimension bucket — real, not an error).

    Scale shape: an equi-join on the user key with the episode-bounds
    predicate as the join residual; fanout per fact row is the user's
    episode count on the probe side but each row MATCHES at most one
    episode (episodes partition the timeline by construction). At
    warehouse scale this is the standard fact |X| SCD2 plan; a
    date-bucketed episode key is the documented refinement when episode
    counts per key grow large. Output: tier, n_events, n_users,
    sum_cents."""
    from . import load

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        _ep().alias("ep"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    hist = scd2_history(load(spark, sf_dir, "events")).select(
        F.col("user_id").alias("h_user"),
        "tier",
        "valid_from_us",
        "valid_to_us",
    )
    joined = ev.join(
        hist,
        (ev.user_id == F.col("h_user"))
        & (F.col("ep") >= F.col("valid_from_us"))
        & (
            (F.col("valid_to_us") == OPEN_END)
            | (F.col("ep") <= F.col("valid_to_us"))
        ),
        "left",
    )
    return (
        joined.select(
            F.coalesce("tier", F.lit(-1)).alias("tier"),
            "user_id",
            "cents",
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
        )
    )


QUERIES["temporal_dim_join"] = q_temporal_dim_join

ORACLES["temporal_dim_join"] = """
    WITH hist AS ({scd2}),
    j AS (
        SELECT coalesce(h.tier, -1) AS tier, e.user_id,
               round(e.value * 100)::BIGINT AS cents
        FROM events e
        LEFT JOIN hist h
          ON e.user_id = h.user_id
         AND epoch_us(e.ts) >= h.valid_from_us
         AND (h.valid_to_us = {open_end}
              OR epoch_us(e.ts) <= h.valid_to_us)
    )
    SELECT tier, count(*)::BIGINT AS n_events,
           count(DISTINCT user_id)::BIGINT AS n_users,
           sum(cents)::BIGINT AS sum_cents
    FROM j GROUP BY tier
""".format(scd2=ORACLES["scd2_user_tiers"], open_end=OPEN_END)


# --- Custom Python Data Source scan ---------------------------------------------------
SYNTHLOG_ROWS = 20_000
SYNTHLOG_PARTS = 16


def q_custom_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through a CUSTOM CONNECTOR (sources/synthlog.py, the Spark 4
    Python Data Source API): per source partition, the count and byte sum
    of error-level rows under 500 bytes. Two predicates, two fates — the
    level equality is PUSHED into the reader via pushFilters (those rows
    never cross the Python boundary; the physical Filter node carries
    only the residual), the byte bound stays Spark-side. Content is a
    pure function of row id, so the oracle replays the entire connector
    from range() — a third-party source held to the same exact-hash gate
    as every built-in. sf_dir is unused: the source IS the input.

    Scale shape: partitions() plans SYNTHLOG_PARTS independent row-range
    splits (executor-parallel like a parquet split list, never a
    single-task generator); everything after the scan is one map-side-
    combined groupBy. Output: part, n_rows, sum_bytes."""
    from ..sources.synthlog import register

    # spark.sql.python.filterPushdown.enabled is a session-level default in
    # session.get_spark() — building a query must not mutate a shared
    # session. On a session without it, the predicate simply stays
    # Spark-side (correctness unchanged, pushdown pinned by plan_check).
    register(spark)
    df = (
        spark.read.format("synthlog")
        .option("rows", str(SYNTHLOG_ROWS))
        .option("partitions", str(SYNTHLOG_PARTS))
        .load()
    )
    return (
        df.where(F.col("level") == "error")
        .where(F.col("n_bytes") < 500)
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_bytes").alias("sum_bytes"),
        )
        .select(F.col("part").cast("long").alias("part"), "n_rows",
                "sum_bytes")
    )


QUERIES["custom_source_scan"] = q_custom_source_scan

# step mirrors SynthLogReader.partitions(): ceil(rows / parts)
_SYNTHLOG_STEP = -(-SYNTHLOG_ROWS // SYNTHLOG_PARTS)

ORACLES["custom_source_scan"] = f"""
    WITH src AS (
        SELECT i, i // {_SYNTHLOG_STEP} AS part,
               (i * 2654435761) % 1000 AS n_bytes
        FROM (SELECT unnest(range(0, {SYNTHLOG_ROWS})) AS i)
        WHERE i % 4 = 3  -- LEVELS[3] = 'error'
    )
    SELECT part::BIGINT AS part, count(*)::BIGINT AS n_rows,
           sum(n_bytes)::BIGINT AS sum_bytes
    FROM src WHERE n_bytes < 500
    GROUP BY part
"""


# --- Rendezvous-hash shard assignment (round 4) ------------------------------------
HRW_SHARDS = 8


def _hrw_key(did, s: int):
    """Packed rendezvous weight for (doc, shard): md5-derived 32-bit weight
    in the high bits, (15 - s) in the low nibble so an (astronomically
    unlikely) weight tie resolves to the SMALLER shard id under max()."""
    w = F.conv(
        F.substring(F.md5(F.concat(did, F.lit(f":{s}"))), 1, 8), 16, 10
    ).cast("long")
    return w * 16 + (15 - s)


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — the layout
    primitive for distributing a 100 TB corpus over N stores: every doc
    hashes once per shard and takes the argmax, so adding a shard moves
    only ~1/(N+1) of the keys (measured here: the same docs re-assigned
    under {HRW_SHARDS}+1 shards, per-shard moved counts reported) — the
    property consistent-hashing buys over mod-N's full reshuffle. The
    weight table is S bounded expressions per row (a pure map), the
    argmax a packed-integer array_max; per-shard stats are one hash
    aggregate; shares ride a window over the <= {HRW_SHARDS}-row
    aggregated frame (bounded, the drift-rows pattern).

    Output per shard: shard, n_docs, share_permille, n_moved,
    moved_permille."""
    from . import load

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    k8 = F.array(*[_hrw_key(did, s) for s in range(HRW_SHARDS)])
    k9 = F.array(*[_hrw_key(did, s) for s in range(HRW_SHARDS + 1)])
    assigned = docs.select(
        (15 - F.array_max(k8) % 16).cast("long").alias("shard"),
        (15 - F.array_max(k9) % 16).cast("long").alias("shard9"),
    )
    per = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("shard") != F.col("shard9")).cast("long")
        ).alias("n_moved"),
    )
    return per.select(
        "shard",
        "n_docs",
        F.expr(
            "n_docs * 1000 div nullif(sum(n_docs) over (), 0)"
        ).alias("share_permille"),
        "n_moved",
        F.expr("n_moved * 1000 div nullif(n_docs, 0)").alias(
            "moved_permille"
        ),
    )


QUERIES["shard_assign"] = q_shard_assign

_HRW8_DUCK = ", ".join(
    f"(('0x' || substring(md5(doc_id::VARCHAR || ':{s}'), 1, 8))::BIGINT"
    f" * 16 + {15 - s})"
    for s in range(HRW_SHARDS)
)
_HRW9_DUCK = ", ".join(
    f"(('0x' || substring(md5(doc_id::VARCHAR || ':{s}'), 1, 8))::BIGINT"
    f" * 16 + {15 - s})"
    for s in range(HRW_SHARDS + 1)
)

ORACLES["shard_assign"] = f"""
    WITH a AS (
        SELECT (15 - greatest({_HRW8_DUCK}) % 16)::BIGINT AS shard,
               (15 - greatest({_HRW9_DUCK}) % 16)::BIGINT AS shard9
        FROM documents
    ), per AS (
        SELECT shard, count(*)::BIGINT AS n_docs,
               sum((shard <> shard9)::BIGINT)::BIGINT AS n_moved
        FROM a GROUP BY shard
    )
    SELECT shard, n_docs,
           (n_docs * 1000 // nullif(sum(n_docs) OVER (), 0))::BIGINT
               AS share_permille,
           n_moved,
           (n_moved * 1000 // nullif(n_docs, 0))::BIGINT AS moved_permille
    FROM per
"""
