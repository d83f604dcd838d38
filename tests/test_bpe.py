"""BPE merge learning: matches a pure-Python reference (greedy left-to-right
pair semantics, deterministic tie-break) step for step."""
from collections import Counter

from pdf_extractor_spark.operators.bpe import END_MARK, bpe_encode, bpe_fit


def _py_bpe(texts, n_merges):
    words = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    state = {w: list(w) + [END_MARK] for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        (l, r), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, pc))
        for w, syms in state.items():
            out, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == l and s == r:
                    out.append(l + r)
                    pend = None
                else:
                    out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            state[w] = out
    return merges


def _run(spark, texts, n):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r["step"], r["lft"], r["rgt"], r["pair_count"])
        for r in bpe_fit(docs, n).orderBy("step").collect()
    ]


def test_matches_python_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
    ] * 3
    assert _run(spark, texts, 6) == _py_bpe(texts, 6)


def test_overlapping_run_greedy(spark):
    # 'aaaa' with best pair (a,a): adjacency counting sees 3 overlapping
    # (a,a) per word; the greedy pass merges two non-overlapping 'aa'.
    # Step 2 then ties (aa,aa)=3 with (aa,</w>)=3 and the (l,r)-ascending
    # break picks ('aa','</w>') — whereas a broken merge ([aa,a,a]) would
    # have picked ('a','</w>'). Both engines and the Python ref agree.
    texts = ["aaaa aaaa aaaa"]
    got = _run(spark, texts, 2)
    assert got == _py_bpe(texts, 2)
    assert got[0] == (1, "a", "a", 9)
    assert got[1] == (2, "aa", "</w>", 3)


def _py_encode(texts, n_merges):
    merges = _py_bpe(texts, n_merges)
    words = {w for t in texts for w in t.split()}
    state = {w: list(w) + [END_MARK] for w in words}
    for _, l, r, _ in merges:
        for w, syms in state.items():
            out, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == l and s == r:
                    out.append(l + r)
                    pend = None
                else:
                    out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            state[w] = out
    out = {}
    for i, t in enumerate(texts):
        toks = [s for w in t.split() for s in state[w]]
        out[i] = (len(toks), " ".join(toks))
    return out


def test_encode_matches_python_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["tokens"])
        for r in bpe_encode(docs, 4).collect()
    }
    assert got == _py_encode(texts, 4)


def test_encode_preserves_word_order(spark):
    # Two docs sharing vocabulary but in different orders must encode to
    # different token streams (the regroup sorts by position, not word).
    texts = ["ab ba", "ba ab"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, 1).collect()}
    assert got[0] != got[1]
    assert sorted(got[0].split()) == sorted(got[1].split())


def test_oracle_survives_regex_metachar_symbols(spark):
    """Learned symbols containing regex metacharacters ('(', '.', '+', '*')
    must not break the DuckDB oracle: the replacement is an exact literal
    splice, never a regexp. A regexp-based replace would either error on
    an unbalanced '(' or silently diverge from the literal position()
    recursion guard (infinite recursion)."""
    import duckdb
    import pandas as pd

    from pdf_extractor_spark.operators.bpe import _bpe_oracle

    # '((' and '..' dominate the pair counts, so the learned merge table
    # itself contains metachar symbols by step 2
    texts = ["(( (( (( .. .. a+* a+*"] * 3
    want = _py_bpe(texts, 4)
    assert any("(" in l or "." in l for _, l, _r, _ in want)

    got_spark = _run(spark, texts, 4)
    assert got_spark == want

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got_duck = [
        (int(s), l, r, int(pc))
        for s, l, r, pc in con.execute(
            _bpe_oracle(4) + " ORDER BY step"
        ).fetchall()
    ]
    assert got_duck == want
