"""URL host filtering: parse, registered domain, blocklist and
over-representation decisions."""
import pyspark.sql.functions as F

from pdf_extractor_spark.operators.web import (
    OVERREP_DENOM,
    url_host_filter,
)


def _run(spark, urls):
    docs = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return {r["doc_id"]: r for r in url_host_filter(docs).collect()}


def test_blocklist_overrep_and_ok(spark):
    # 21 docs: 2 on hot.example.com (>1/20), 1 on a blocked domain, the
    # rest on distinct fine hosts.
    urls = (
        ["https://hot.example.com/a", "https://hot.example.com/b"]
        + ["https://bad.example.net/x"]
        + [f"https://s{i}.example.org/p" for i in range(18)]
    )
    assert len(urls) == 21
    out = _run(spark, urls)
    assert out[0]["reason"] == "overrepresented" and not out[0]["keep"]
    assert out[1]["reason"] == "overrepresented"
    assert out[0]["host_docs"] == 2
    assert out[2]["reason"] == "blocklist" and not out[2]["keep"]
    assert out[2]["domain"] == "example.net"
    assert out[5]["reason"] == "ok" and out[5]["keep"]
    assert out[5]["domain"] == "example.org"


def test_blocklist_wins_over_overrep(spark):
    # every doc on one blocked host: blocklist takes precedence
    out = _run(spark, ["https://x.example.net/a"] * 4)
    assert all(r["reason"] == "blocklist" for r in out.values())


def test_single_label_host_is_its_own_domain(spark):
    out = _run(
        spark,
        ["https://localhost/a"]
        + [f"https://h{i}.example.org/x" for i in range(OVERREP_DENOM)],
    )
    assert out[0]["host"] == "localhost"
    assert out[0]["domain"] == "localhost"
    assert out[0]["reason"] == "ok"


def test_port_and_deep_subdomain(spark):
    out = _run(
        spark,
        ["https://a.b.c.example.org:8443/path?q=1"]
        + [f"https://h{i}.example.org/x" for i in range(OVERREP_DENOM)],
    )
    # parse_url strips the path/query; the port stays out of HOST
    assert out[0]["host"] == "a.b.c.example.org"
    assert out[0]["domain"] == "example.org"


def test_url_canonicalize_multi_question_mark_and_utm_prefix(spark):
    # '?' is legal inside a query string: everything after the FIRST '?'
    # is the query, and a middle segment must not be dropped. 'utmost' is
    # a legitimate param — only exact 'utm_'-prefixed params are tracking.
    from pdf_extractor_spark.operators.web import url_canonicalize

    docs = spark.createDataFrame(
        [
            (0, "https://h.example.org/p?a=1?b=2"),
            (1, "https://h.example.org/p?utmost=1&utm_source=feed&a=1"),
        ],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: r["url_canon"] for r in url_canonicalize(docs).collect()}
    assert out[0] == "https://h.example.org/p?a=1?b=2"
    assert out[1] == "https://h.example.org/p?a=1&utmost=1"
