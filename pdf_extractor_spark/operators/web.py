"""Web-provenance curation: URL host parsing, registered-domain rollup, and
host-level filtering (domain blocklist + over-representation cap) — the
RefinedWeb/C4-style provenance gate a web-scale corpus runs before content
filters.

The synthetic driver corpus carries no URL column, so a deterministic URL is
synthesized JVM-side from (doc_id, lang) — the same pattern as
operators/multimodal.py wrapping documents into WAV/BMP containers: the
synthesis is the fixture, the OPERATOR work (host extraction, registered-
domain derivation, corpus host statistics, policy join) is real and is what
scales. One in ten docs lands on a hub host so the over-representation rule
has genuine work at test scale.

Scale shape: host frequency is one hash-groupBy keyed on host (hot hosts are
fine — the aggregate carries a count, not rows); the host-stats frame is
bounded by the number of distinct hosts, orders below the corpus, so the
join back is a broadcast; the corpus total is a 1-row broadcast cross join.
The keep decision is a pure map over cross-multiplied integers — no floats,
no windows, no Python.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Registered domains rejected outright (license/abuse lists in production).
BLOCKED_DOMAINS = ["example.net"]
# A host holding more than 1/OVERREP_DENOM of the corpus is over-represented
# (C4/RefinedWeb cap the contribution of any single site).
OVERREP_DENOM = 20

_TLD = "CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org' " \
       "WHEN 2 THEN 'net' ELSE 'io' END"
URL_EXPR = (
    "concat('https://', "
    " CASE WHEN doc_id % 10 = 0 THEN 'hub.example.com' "
    f"      ELSE concat('site', doc_id % 37, '.example.', {_TLD}) END, "
    " '/', lang, '/doc-', doc_id)"
)


def _registered_domain(host: F.Column) -> F.Column:
    """Last two dot-labels (public-suffix lists are a lookup-table refinement
    on the same shape)."""
    return F.when(
        F.size(F.split(host, r"\.")) < 2, host
    ).otherwise(F.substring_index(host, ".", -2))


def url_host_filter(docs_with_url: DataFrame) -> DataFrame:
    """Per document: its parsed host, registered domain, the host's corpus
    doc count, and the keep decision with a reason — 'blocklist' (domain on
    the reject list), 'overrepresented' (host holds > 1/OVERREP_DENOM of
    the corpus), or 'ok'.

    Expects a frame with (doc_id, url); host parsing uses the JVM
    ``parse_url`` expression.

    The host-stats broadcast hint is valid while distinct hosts stay
    orders below the corpus (the usual web shape: ~10^7-10^8 hosts at
    16 bytes/row against 10^10+ docs). Past broadcastable size, drop the
    hint — the join is already host-equi-keyed, so AQE falls back to a
    shuffle hash join with identical semantics; only the hint, not the
    shape, is scale-bound."""
    parsed = docs_with_url.select(
        "doc_id",
        F.expr("parse_url(url, 'HOST')").alias("host"),
    ).withColumn("domain", _registered_domain(F.col("host")))
    host_stats = parsed.groupBy("host").agg(
        F.count("*").alias("host_docs")
    )
    total = parsed.agg(F.count("*").alias("n_total"))
    reason = (
        F.when(F.col("domain").isin(BLOCKED_DOMAINS), F.lit("blocklist"))
        .when(
            F.col("host_docs") * OVERREP_DENOM > F.col("n_total"),
            F.lit("overrepresented"),
        )
        .otherwise(F.lit("ok"))
    )
    return (
        parsed.join(F.broadcast(host_stats), "host")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "host",
            "domain",
            "host_docs",
            reason.alias("reason"),
            (reason == "ok").alias("keep"),
        )
    )


def q_url_host_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(URL_EXPR).alias("url")
    )
    return url_host_filter(docs)


QUERIES = {"url_host_filter": q_url_host_filter}

ORACLES = {
    "url_host_filter": f"""
        WITH u AS (
            SELECT doc_id,
                   'https://' ||
                   CASE WHEN doc_id % 10 = 0 THEN 'hub.example.com'
                        ELSE 'site' || (doc_id % 37)::VARCHAR ||
                             '.example.' ||
                             CASE doc_id % 4 WHEN 0 THEN 'com'
                                  WHEN 1 THEN 'org' WHEN 2 THEN 'net'
                                  ELSE 'io' END
                   END || '/' || lang || '/doc-' || doc_id::VARCHAR AS url
            FROM documents
        ), p AS (
            SELECT doc_id,
                   regexp_extract(url, '^https?://([^/]+)', 1) AS host
            FROM u
        ), d AS (
            SELECT doc_id, host,
                   CASE WHEN len(string_split(host, '.')) < 2 THEN host
                        ELSE array_to_string(
                            string_split(host, '.')[
                                len(string_split(host, '.')) - 1 :
                            ], '.')
                   END AS domain
            FROM p
        ), hs AS (
            SELECT host, count(*) AS host_docs FROM d GROUP BY host
        ), t AS (SELECT count(*) AS n_total FROM d)
        SELECT doc_id, host, domain, host_docs,
               CASE WHEN domain IN ('example.net') THEN 'blocklist'
                    WHEN host_docs * {OVERREP_DENOM} > n_total
                        THEN 'overrepresented'
                    ELSE 'ok' END AS reason,
               (CASE WHEN domain IN ('example.net') THEN 'blocklist'
                     WHEN host_docs * {OVERREP_DENOM} > n_total
                         THEN 'overrepresented'
                     ELSE 'ok' END) = 'ok' AS keep
        FROM d JOIN hs USING (host), t
    """,
}
