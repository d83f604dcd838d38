"""bitext_clean behavioral tests: four orthogonal (src, tgt) twin pairs,
each engineered to trip exactly one gate (or none), so every gate's verdict
and the final kept flag are fully determined."""
from pdf_extractor_spark.operators.similarity_search import q_bitext_clean

DIM = 8


def _toy(spark, tmp_path):
    # even ids = sources, odd = targets; vec 2i == vec 2i+1 (cosine 1.0),
    # distinct pairs orthogonal -> margin mining pairs each source with its
    # twin deterministically.
    emb_rows = []
    for i in range(8):
        vec = [0.0] * DIM
        vec[i // 2] = 1.0
        emb_rows.append((i, vec, 0))
    spark.createDataFrame(
        emb_rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    docs = [
        # clean bitext: cross-lang, both >=5 tokens, ratio 1, no overlap
        (0, "the quick brown fox jumps high", "en"),
        (1, "le renard brun saute tres haut", "fr"),
        # same language -> gate_lang fails
        (2, "alpha beta gamma delta epsilon zeta", "en"),
        (3, "one two three four five six", "en"),
        # short target -> gate_len fails (and ratio fails: 6 vs 2)
        (4, "a full length source sentence here", "en"),
        (5, "too short", "fr"),
        # verbatim copy -> gate_copy fails (overlap 1000 permille)
        (6, "copied text stays exactly the same", "en"),
        (7, "copied text stays exactly the same", "fr"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_gate_verdicts(spark, tmp_path):
    sf_dir = _toy(spark, tmp_path)
    out = {r["src_id"]: r for r in q_bitext_clean(spark, sf_dir).collect()}
    assert set(out) == {0, 2, 4, 6}
    assert all(r["tgt_id"] == s + 1 for s, r in out.items())
    assert all(r["sim_fp"] == 10000 for r in out.values())

    clean = out[0]
    assert clean["kept"] is True
    assert clean["overlap_permille"] == 0
    assert (clean["src_tok"], clean["tgt_tok"]) == (6, 6)

    same_lang = out[2]
    assert same_lang["gate_lang"] is False
    assert same_lang["gate_len"] is True and same_lang["gate_ratio"] is True
    assert same_lang["kept"] is False

    short = out[4]
    assert short["gate_len"] is False
    assert short["gate_ratio"] is False  # 6 vs 2 tokens > 2x
    assert short["kept"] is False

    copy = out[6]
    assert copy["gate_lang"] is True
    assert copy["overlap_permille"] == 1000
    assert copy["gate_copy"] is False
    assert copy["kept"] is False


def test_sf_corpus_consistency(spark):
    rows = q_bitext_clean(spark, "/root/testdata/sf0.001").collect()
    assert rows, "mined pairs expected at sf0.001"
    for r in rows:
        assert r["kept"] == (
            r["gate_lang"] and r["gate_len"]
            and r["gate_ratio"] and r["gate_copy"]
        )
        assert 0 <= r["overlap_permille"] <= 1000
