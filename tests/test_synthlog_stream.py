"""Custom streaming Data Source (sources/synthlog.py, DataSourceStreamReader):
offset-paced micro-batches, executor-parallel splits within a batch, full
coverage with no duplicates, deterministic content."""
from pyspark.sql import functions as F

from pdf_extractor_spark.sources.synthlog import (
    BYTES_MOD,
    BYTES_MULT,
    LEVELS,
    register_stream,
)


def test_stream_batches_cover_exactly_once(spark, tmp_path):
    register_stream(spark)
    df = (
        spark.readStream.format("synthlog_stream")
        .option("rows", "1000")
        .option("batchsize", "300")
        .option("partitions", "4")
        .load()
    )
    batches = []

    def fn(b, bid):
        batches.append((bid, [tuple(r) for r in b.collect()]))

    q = (
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # rate limit: 300 rows per poll -> batch sizes 300/300/300/100
    sizes = [len(rows) for _, rows in sorted(batches)]
    assert sizes == [300, 300, 300, 100]
    all_rows = [r for _, rows in batches for r in rows]
    ids = sorted(r[0] for r in all_rows)
    assert ids == list(range(1000))  # exactly once, full coverage
    # executor-parallel splits within a batch: 4 distinct part indexes
    assert {r[1] for _, rows in batches for r in rows if len(rows) == 300} == {
        0, 1, 2, 3
    }
    # deterministic content formula
    for r in all_rows[:50]:
        assert r[2] == LEVELS[r[0] % 4]
        assert r[3] == (r[0] * BYTES_MULT) % BYTES_MOD
