"""span_corruption behavioral tests: an independent pure-Python replay of
the deterministic window/sentinel rule on a hand-sized doc, plus the
reconstruction invariant (inputs' kept tokens + targets' masked tokens
restore the original document, in order) over the sf0.001 corpus."""
import hashlib

from pdf_extractor_spark.operators.text_ops import (
    SPAN_DEN,
    SPAN_L,
    SPAN_W,
    q_span_corruption,
)


def _replay(text):
    t = [w for w in text.split() if w]
    h = hashlib.md5(text.encode()).hexdigest()
    inp, tgt, k, masked = [], [], 0, 0
    for w in range(0, (len(t) + SPAN_W - 1) // SPAN_W):
        win = t[w * SPAN_W : w * SPAN_W + SPAN_W]
        hw = hashlib.md5(f"{h}:{w}".encode()).hexdigest()
        corr = int(hw[:8], 16) % SPAN_DEN == 0
        if corr:
            m, kept = win[:SPAN_L], win[SPAN_L:]
            sent = f"<X_{k}>"
            inp.append(sent + (" " + " ".join(kept) if kept else ""))
            tgt.append(sent + " " + " ".join(m))
            k += 1
            masked += len(m)
        else:
            inp.append(" ".join(win))
    return {
        "n_tokens": len(t),
        "n_spans": k,
        "n_masked": masked,
        "inputs_text": " ".join(inp),
        "targets_text": " ".join(tgt),
    }


def _write_docs(spark, tmp_path, texts):
    rows = [(i, s) for i, s in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_matches_python_replay(spark, tmp_path):
    texts = [
        " ".join(f"w{i}" for i in range(20)),
        " ".join(f"tok{i}" for i in range(50)),
        "short doc",
        " ".join(f"x{i}" for i in range(8 * 6)),  # exact window multiple
    ]
    sf_dir = _write_docs(spark, tmp_path, texts)
    out = {r["doc_id"]: r.asDict() for r in q_span_corruption(spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2, 3}
    for i, text in enumerate(texts):
        exp = _replay(text)
        got = out[i]
        for key, val in exp.items():
            assert got[key] == val, (i, key, got[key], val)


def test_reconstruction_invariant(spark):
    rows = q_span_corruption(spark, "/root/testdata/sf0.001").collect()
    assert rows
    saw_span = False
    for r in rows:
        inp = r["inputs_text"].split()
        tgt = r["targets_text"].split() if r["targets_text"] else []
        # sentinels appear once in each stream, in matching order
        sent_inp = [w for w in inp if w.startswith("<X_")]
        sent_tgt = [w for w in tgt if w.startswith("<X_")]
        assert sent_inp == [f"<X_{k}>" for k in range(r["n_spans"])]
        assert sent_tgt == sent_inp
        # splicing targets back into inputs restores the original stream
        spans = {}
        cur = None
        for w in tgt:
            if w.startswith("<X_"):
                cur = w
                spans[cur] = []
            else:
                spans[cur].append(w)
        restored = []
        for w in inp:
            restored.extend(spans[w] if w.startswith("<X_") else [w])
        assert len(restored) == r["n_tokens"]
        assert sum(len(v) for v in spans.values()) == r["n_masked"]
        saw_span = saw_span or r["n_spans"] > 0
    assert saw_span, "corpus should trigger at least one corrupted window"
