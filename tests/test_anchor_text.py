"""anchor_text_agg: per-target in-link stats from a hand-built link frame —
rank order (count desc, anchor asc), top-K truncation, distinct-host count."""
from pdf_extractor_spark.operators.web import ANCHOR_TOP_K, anchor_text_agg


def test_anchor_rank_and_hosts(spark):
    links = spark.createDataFrame(
        [
            # target 1: "beta" x2 beats "alpha" x1; two source hosts
            (10, "a.com", 1, "beta"),
            (11, "b.org", 1, "beta"),
            (12, "a.com", 1, "alpha"),
            # target 2: four distinct anchors -> top-K truncates to 3,
            # ties broken alphabetically
            (10, "a.com", 2, "delta"),
            (11, "a.com", 2, "gamma"),
            (12, "a.com", 2, "epsilon"),
            (13, "a.com", 2, "zeta"),
        ],
        "src long, src_host string, tgt long, anchor string",
    )
    out = {r["doc_id"]: r for r in anchor_text_agg(links).collect()}
    assert out[1]["in_degree"] == 3
    assert out[1]["n_src_hosts"] == 2
    assert out[1]["top_anchors"] == "beta(2),alpha(1)"
    assert out[2]["in_degree"] == 4
    assert out[2]["n_src_hosts"] == 1
    # all counts tie at 1 -> alphabetical, truncated to ANCHOR_TOP_K
    assert out[2]["top_anchors"] == "delta(1),epsilon(1),gamma(1)"
    assert len(out[2]["top_anchors"].split(",")) == ANCHOR_TOP_K
