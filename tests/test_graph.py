"""Fixed-point PageRank vs hand-computed updates (operators/graph.py)."""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.operators.graph import SCALE, pagerank


def test_pagerank_two_node_hand_computed(spark):
    """A -> B, one iteration: teleport 0.15*S/2 each; B gets A's full
    share damped; dangling B redistributes S/4 to both."""
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r["node"]: r["rank_units"]
           for r in pagerank(edges, n_iters=1).collect()}
    s2 = SCALE // 2
    tele = (15 * s2) // 100
    dm_each = s2 // 2
    want_a = tele + (85 * (0 + dm_each)) // 100
    want_b = tele + (85 * (s2 + dm_each)) // 100
    assert got == {0: want_a, 1: want_b}
    assert abs(sum(got.values()) - SCALE) <= 2  # truncation dust only


def test_pagerank_sink_attracts_mass_and_is_deterministic(spark):
    # ring 0->1->2 plus everyone also links to hub 3 (a sink)
    e = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
    edges = spark.createDataFrame(e, "src long, dst long")
    r1 = {r["node"]: r["rank_units"]
          for r in pagerank(edges, n_iters=5).collect()}
    assert r1[3] > max(r1[0], r1[1], r1[2])  # hub wins
    assert abs(sum(r1.values()) - SCALE) <= 4 * 5
    # pure function of the graph: partitioning must not change a unit
    r2 = {r["node"]: r["rank_units"]
          for r in pagerank(edges.repartition(7), n_iters=5).collect()}
    assert r1 == r2


def test_pagerank_validation(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping_pct=0)
    with pytest.raises(ValueError, match="n_iters"):
        pagerank(edges, n_iters=0)
