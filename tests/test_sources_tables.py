"""Iceberg-or-parquet IO adapter: in this environment (no iceberg runtime
jar) the adapter must detect absence and fall back to parquet for both path
and round-trip writes."""
import os

from pdf_extractor_spark.sources.tables import (
    iceberg_available,
    read_table,
    write_table,
)
from pdf_extractor_spark.sources.transcripts import transcripts_df


def test_iceberg_detection_is_false_here(spark):
    assert iceberg_available(spark) is False


def test_parquet_roundtrip_via_adapter(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t.parquet")
    df = transcripts_df(spark, 3, seed=7)
    write_table(df, path, mode="overwrite")
    back = read_table(spark, path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
