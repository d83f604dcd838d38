"""Driver-contract smoke tests: entry() runs, every queries() entry runs at
sf0.001, and a representative oracle subset matches DuckDB exactly (the full
sweep lives in scripts/check_oracles.py)."""
import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

ORACLE_SUBSET = [
    "normalize_text", "sessionize", "pricing_summary", "dedup_minhash_lsh",
    "knn_cosine", "multimodal_features", "spatial_join",
    "table_merge_sessions", "markdown_parse", "language_id",
    "section_assembly", "tumbling_window",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return "NULL" if v is None else str(v)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "conv_id" in df.columns


def test_all_queries_run(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 45


@pytest.mark.parametrize("name", ORACLE_SUBSET)
def test_oracle_match(spark, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    spark_rows = sdf.collect()
    cols = sorted(sdf.columns)
    ddf = duck.execute(entry_mod.oracle_sql()[name]).fetch_df()
    assert sorted(ddf.columns) == cols
    s_keys = sorted("|".join(_canon(r[c]) for c in cols) for r in spark_rows)
    d_keys = sorted("|".join(_canon(r[c]) for c in cols)
                    for r in ddf.to_dict("records"))
    assert s_keys == d_keys
