"""Bucketed co-located join: pay the shuffle once at write time — the
equi-join of two tables bucketed+sorted on the same key plans with no
Exchange and no Sort on either side."""
import re

import pytest

from pdf_extractor_spark.sources.tables import save_bucketed


@pytest.fixture()
def bucketed_tables(spark):
    docs = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "concat('text ', id) AS text"
    )
    stats = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "id % 7 AS score"
    )
    save_bucketed(docs, "bj_docs", "doc_id", n_buckets=8)
    save_bucketed(stats, "bj_stats", "doc_id", n_buckets=8)
    yield "bj_docs", "bj_stats"
    spark.sql("DROP TABLE IF EXISTS bj_docs")
    spark.sql("DROP TABLE IF EXISTS bj_stats")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    a, b = bucketed_tables
    # hint away the small-table broadcast so the test exercises the
    # co-located merge path the bucketing exists for
    joined = spark.table(a).hint("merge").join(spark.table(b), "doc_id")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "simple"
    )
    assert "SortMergeJoin" in plan  # bucketed SMJ, not a shuffle+broadcast
    assert not re.search(r"\bExchange\b", plan), plan
    # pre-sorted buckets: no explicit Sort nodes either
    assert joined.count() == 2000


def test_unbucketed_join_pays_the_shuffle(spark, bucketed_tables):
    """Control: the same join against a plain frame needs an Exchange —
    pinning that the bucketed plan above is the bucketing, not AQE luck."""
    a, _ = bucketed_tables
    plain = spark.range(0, 2000).selectExpr("id AS doc_id", "id AS v")
    joined = spark.table(a).join(plain.hint("merge"), "doc_id")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "simple"
    )
    assert re.search(r"\bExchange\b", plan)
