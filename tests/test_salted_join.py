"""Skew-salted join: result-equality with the plain join, hot-key spread."""
import pyspark.sql.functions as F

from pdf_extractor_spark.operators.joins import salted_join


def test_equals_plain_join_under_hot_key(spark):
    # 90% of the big side hits one key
    big = spark.createDataFrame(
        [(i, 7 if i % 10 else i) for i in range(1000)],
        "row_id long, k long",
    )
    small = spark.createDataFrame(
        [(k, f"v{k}") for k in range(1000)], "k long, v string"
    )
    got = {
        (r["row_id"], r["v"])
        for r in salted_join(big, small, "k", row_key="row_id").collect()
    }
    want = {
        (r["row_id"], r["v"]) for r in big.join(small, "k").collect()
    }
    assert got == want and len(got) == 1000


def test_salt_spreads_hot_key(spark):
    from pdf_extractor_spark.operators.joins import SKEW_SALT

    big = spark.createDataFrame(
        [(i, 7) for i in range(400)], "row_id long, k long"
    )
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64("row_id"), F.lit(SKEW_SALT)).cast("int")
    )
    n = salted.select("_salt").distinct().count()
    assert n == SKEW_SALT  # the hot key's rows occupy every salt shard
