"""Streaming tool-retry detector: micro-batch increments must sum to the
batch operator's totals, including retries that straddle a batch boundary
(the O(1) cross-batch state)."""
import os

from pdf_extractor_spark.operators.agent import tool_retry_stats
from pdf_extractor_spark.streaming.agent_stream import tool_retry_stream

EV_SCHEMA = "user_id long, event_id long, ep long, event_type string"


def _events(spark):
    """10 users, 30 events each, 1 minute apart; types cycle with injected
    immediate repeats so retries exist, plus error->recovery sequences."""
    types = ["search", "browser", "error", "search", "search",
             "calculator", "error", "error", "browser", "browser"]
    rows = []
    for u in range(10):
        for i in range(30):
            t = types[(i + u) % len(types)]
            rows.append((u, i, i * 60_000_000, t))
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_stream_increments_sum_to_batch_totals(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    # three time-slice files written IN ORDER -> three ordered micro-batches
    # with maxFilesPerTrigger=1; slice cuts fall mid-repeat for several
    # users, so cross-batch state is load-bearing
    ev.where("ep < 600000000").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    ev.where("ep >= 600000000 AND ep < 1200000000").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.where("ep >= 1200000000").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        tool_retry_stream(stream)
        .writeStream.format("memory")
        .queryName("retry_increments")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["tool"]: r
        for r in spark.sql(
            """
            SELECT tool, sum(n_calls) AS n_calls,
                   sum(n_retries) AS n_retries,
                   sum(n_recoveries) AS n_recoveries
            FROM retry_increments GROUP BY tool
            """
        ).collect()
    }
    # batch operator on the full frame (retry_permille is derived -> skip)
    want = {r["tool"]: r for r in tool_retry_stats(_events(spark)).collect()}
    assert set(got) == set(want)
    for t in want:
        for f in ("n_calls", "n_retries", "n_recoveries"):
            assert got[t][f] == want[t][f], (t, f, got[t][f], want[t][f])
    # the fixture actually exercises both detectors
    assert sum(r["n_retries"] for r in want.values()) > 0
    assert sum(r["n_recoveries"] for r in want.values()) > 0

    # state crossed batch boundaries: increments arrived over several
    # batches for the same tool
    multi = spark.sql(
        "SELECT tool, count(*) AS n FROM retry_increments GROUP BY tool"
    ).collect()
    assert max(r["n"] for r in multi) > 1
