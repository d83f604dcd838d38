"""End-to-end training-data curation (plans/training_data.py)."""
import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.plans.training_data import curate
from pdf_extractor_spark.sources.transcripts import transcripts_df


@pytest.fixture(scope="module")
def curated(spark):
    return curate(transcripts_df(spark, 60, seed=42)).cache()


def test_schema_and_rows(curated):
    assert set(curated.columns) == {
        "conv_id", "split", "text", "n_words", "n_turns", "total_pages",
        "n_boiler_lines", "n_decon_words",
    }
    assert curated.where(F.col("n_decon_words") != 0).count() == 0
    n = curated.count()
    assert 0 < n <= 60


def test_quality_gate_applied(curated):
    assert curated.where(F.col("n_words") < 20).count() == 0


def test_split_deterministic_and_complete(spark, curated):
    splits = {r["split"] for r in curated.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    again = curate(transcripts_df(spark, 60, seed=42))
    a = {(r["conv_id"], r["split"]) for r in curated.select("conv_id", "split").collect()}
    b = {(r["conv_id"], r["split"]) for r in again.select("conv_id", "split").collect()}
    assert a == b


def test_dedup_and_pii(spark):
    """Inject a duplicate conversation and a PII-bearing one."""
    base = transcripts_df(spark, 5, seed=42)
    # bigram-unique filler: a repeated "beta gamma" here would trip the
    # repetition gate (top-2-gram coverage), which is not what this test
    # is about
    long_text = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
    extra = spark.createDataFrame(
        [
            ("zz_dup_1", 0, "user", long_text, None, None),
            ("zz_dup_2", 0, "user", long_text, None, None),
            ("zz_pii", 0, "user",
             long_text + " contact someone@example.com now", None, None),
        ],
        base.schema,
    )
    out = curate(base.union(extra)).collect()
    by_id = {r["conv_id"]: r for r in out}
    # exact dedup keeps the lexicographically-first conv_id
    assert "zz_dup_1" in by_id and "zz_dup_2" not in by_id
    assert "[EMAIL]" in by_id["zz_pii"]["text"]
    assert "someone@example.com" not in by_id["zz_pii"]["text"]


def test_boilerplate_and_repetition_stages(spark):
    """The round-3 stages fire inside curate: a banner line present in >= 3
    conversations vanishes from all of them; a conversation dominated by
    one repeated bigram is dropped entirely."""
    base = transcripts_df(spark, 5, seed=42)
    banner = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
    filler = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
    rows = [
        (f"zz_banner_{k}", 0, "user", f"{banner}\n{filler} uniq{k}",
         None, None)
        for k in range(3)
    ]
    rows.append(("zz_repeat", 0, "user", "dup word " * 60, None, None))
    extra = spark.createDataFrame(rows, base.schema)
    out = {r["conv_id"]: r for r in curate(base.union(extra)).collect()}
    for k in range(3):
        r = out[f"zz_banner_{k}"]
        assert banner not in r["text"]
        assert r["n_boiler_lines"] >= 1
        assert f"uniq{k}" in r["text"]
    assert "zz_repeat" not in out


def test_benchmark_decontamination_stage(spark):
    """With an eval suite supplied, a conversation containing a benchmark
    passage loses exactly that span; clean conversations are untouched."""
    base = transcripts_df(spark, 5, seed=42)
    # two DIFFERENT fillers: repeating one filler twice would legitimately
    # trip the duplicated-5-gram repetition gate before decontamination
    filler_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
    filler_b = " ".join(f"delta{i} eps{i} zeta{i}" for i in range(30))
    leak = "the capital of france is paris"
    extra = spark.createDataFrame(
        [
            ("zz_leak", 0, "user", f"{filler_a} {leak} {filler_b}", None, None),
            ("zz_clean", 0, "user", filler_a + " somethingelse", None, None),
        ],
        base.schema,
    )
    bench = spark.createDataFrame([(leak,)], "text string")
    out = {
        r["conv_id"]: r
        for r in curate(base.union(extra), benchmark=bench).collect()
    }
    assert out["zz_leak"]["n_decon_words"] >= 6
    assert "capital of france" not in out["zz_leak"]["text"]
    assert f"alpha0" in out["zz_leak"]["text"]  # clean spans survive
    assert out["zz_clean"]["n_decon_words"] == 0


def test_curate_packed_end_to_end(spark, curated):
    from pdf_extractor_spark.functions.expressions import token_count_expr
    from pdf_extractor_spark.plans.training_data import curate_packed

    st = 128
    packed = curate_packed(
        transcripts_df(spark, 60, seed=42), seq_tokens=st
    ).cache()
    rows = packed.orderBy("seq_id").collect()
    assert rows, "train split should pack into at least one sequence"
    # token conservation: the manifest accounts for every train token
    train_tokens = (
        curated.where(F.col("split") == "train")
        .select(token_count_expr(F.col("text")).alias("t"))
        .agg(F.sum("t"))
        .first()[0]
    )
    assert sum(r["n_tokens"] for r in rows) == train_tokens
    # every sequence but the last is exactly full
    for r in rows[:-1]:
        assert r["n_tokens"] == st
    assert 0 < rows[-1]["n_tokens"] <= st
    # the epoch order is an exact permutation of the sequences
    assert sorted(r["pos"] for r in rows) == list(range(len(rows)))
