"""PageRank: independent pure-Python replay + structural properties."""
import pyspark.sql.functions as F

from pdf_extractor_spark.operators import graph


def _py_pagerank(n, edges, iters):
    """Same integer spec, stdlib only. edges: list of (src, dst, outdeg)."""
    r = {v: graph.PR_SCALE // n for v in range(n)}
    base = (15 * (graph.PR_SCALE // n)) // 100
    for _ in range(iters):
        s = {v: 0 for v in range(n)}
        for src, dst, outdeg in edges:
            s[dst] += r[src] // outdeg
        r = {v: base + (85 * s[v]) // 100 for v in range(n)}
    return r


def _fixture_edges(n):
    out = []
    for u in range(n):
        outdeg = 1 + u % 3
        out.append((u, (u + 1) % n, outdeg))
        if u % 3 >= 1:
            out.append((u, (u + 7) % n, outdeg))
        if u % 3 == 2:
            out.append((u, (u + 42) % n, outdeg))
    return out


def test_matches_python_replay(spark):
    n = 60
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    docs_n = docs.crossJoin(
        F.broadcast(docs.agg(F.count("*").alias("n")))
    )
    got = {
        r.node: r.pr
        for r in graph.pagerank(
            docs_n, graph._link_edges(docs_n)
        ).collect()
    }
    want = _py_pagerank(n, _fixture_edges(n), graph.PR_ITERS)
    assert got == want


def test_rank_properties(spark):
    out = graph.q_pagerank(spark, "/root/testdata/sf0.001").collect()
    n = len(out)
    total = sum(r.pr for r in out)
    # floor-division loses at most a few units per node per round
    assert abs(total - graph.PR_SCALE) < n * (graph.PR_ITERS + 1) * 120
    # varying degrees -> genuinely non-uniform stationary mass
    assert len({r.pr for r in out}) > n // 10
    assert min(r.pr for r in out) > 0
