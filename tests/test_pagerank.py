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


def test_triangle_count_matches_bruteforce(spark):
    from itertools import combinations

    out = graph.q_triangle_count(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    n = out.n_nodes
    edges = set()
    for u in range(n):
        edges.add((min(u, (u + 1) % n), max(u, (u + 1) % n)))
        if u % 3 >= 1:
            edges.add((min(u, (u + 2) % n), max(u, (u + 2) % n)))
        if u % 3 == 2:
            edges.add((min(u, (u + 3) % n), max(u, (u + 3) % n)))
    edges = {(a, b) for a, b in edges if a != b}
    assert out.n_edges == len(edges)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a in adj
        for b, c in combinations(sorted(x for x in adj[a] if x > a), 2)
        if c in adj.get(b, ())
    )
    assert out.n_triangles == tri
    assert tri > 0  # the +1/+7/+42 circulant closes real triangles
