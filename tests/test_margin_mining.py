"""Margin-based bitext mining (similarity_search.margin_pairs): the hub
correction on a crafted embedding frame — a hub target close to EVERY source
must lose to a specific translation match, even at equal raw cosine."""
import math

from pdf_extractor_spark.operators.similarity_search import margin_pairs


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_hub_loses_to_specific_match(spark):
    # 4 sources (even ids) in distinct directions; target 1 is a HUB
    # (diagonal — cosine ~0.5 with every source); target 3 is a specific
    # match for source 0 (cosine ~0.98 with it, ~0 with the rest);
    # targets 5,7 pad the k-NN neighborhoods.
    dim = 4
    rows = []
    # sources 0,2,4,6: unit axes
    for i, sid in enumerate((0, 2, 4, 6)):
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((sid, v))
    hub = _unit([1.0, 1.0, 1.0, 1.0])
    rows.append((1, hub))
    rows.append((3, _unit([0.98, 0.2, 0.0, 0.0])))  # source 0's match
    rows.append((5, _unit([0.0, 0.9, 0.4, 0.0])))   # source 2's match
    rows.append((7, _unit([0.1, 0.1, 0.8, 0.6])))   # mixed filler
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {r["src_id"]: r for r in margin_pairs(emb, k=2).collect()}
    assert set(got) == {0, 2, 4, 6}
    # source 0's best-margin target is its specific match (3), not the hub
    assert got[0]["tgt_id"] == 3
    # source 2's best-margin target is its specific match (5)
    assert got[2]["tgt_id"] == 5
    # margins are integers on the 2k-scaled fixed-point scale
    for r in got.values():
        assert isinstance(r["margin_2k"], int)
        assert -8 * 10000 <= r["margin_2k"] <= 8 * 10000


def test_margin_matches_hand_computation(spark):
    # 1 source, 2 targets, k=2: margin_2k = 2k*s - sum_x - sum_y where
    # sum_x covers both targets and each sum_y is the single source sim.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),          # s = 10000
            (3, _unit([1.0, 1.0])),   # s = round(0.7071*1e4) = 7071
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["tgt_id"]: r for r in margin_pairs(emb, k=2).collect()}
    # only the best pair per source is returned
    assert list(rows) == [1]
    r = rows[1]
    assert r["sim_fp"] == 10000
    # sum_x = 10000 + 7071; sum_y(target 1) = 10000
    assert r["margin_2k"] == 4 * 10000 - (10000 + 7071) - 10000
