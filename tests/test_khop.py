"""Bounded multi-source BFS (graphrank.khop_distances): Python-replay
exactness, driver-path == distributed-path, fixpoint early exit."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.graphrank import khop_distances


def _py_bfs(edges, seeds, max_hops):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(dist)
    for d in range(1, max_hops + 1):
        nxt = {m for n in frontier for m in adj.get(n, ()) if m not in dist}
        for m in nxt:
            dist[m] = d
        if not nxt:
            break
        frontier = nxt
    return dist


@pytest.fixture(scope="module")
def graph():
    rng = random.Random(7)
    edges = {(rng.randrange(200), rng.randrange(200)) for _ in range(400)}
    edges = [(a, b) for a, b in edges if a != b]
    seeds = [0, 17, 99]
    return edges, seeds


def _frames(spark, graph):
    edges, seeds = graph
    e = spark.createDataFrame(edges, ["u", "v"])
    s = spark.createDataFrame([(x,) for x in seeds], ["node"])
    return e, s


@pytest.mark.parametrize("hops", [0, 1, 3])
def test_matches_python_bfs_both_paths(spark, graph, hops):
    edges, seeds = graph
    e, s = _frames(spark, graph)
    want = _py_bfs(edges, seeds, hops)
    for threshold in (500_000, 0):  # driver path / forced distributed path
        got = {
            r["node"]: r["dist"]
            for r in khop_distances(
                e, s, max_hops=hops, small_graph_edges=threshold
            ).collect()
        }
        assert got == want, f"threshold={threshold} hops={hops}"


def test_isolated_seed_reports_dist_zero(spark):
    e = spark.createDataFrame([(1, 2)], ["u", "v"])
    s = spark.createDataFrame([(42,), (1,)], ["node"])
    got = {r["node"]: r["dist"] for r in khop_distances(e, s, max_hops=2).collect()}
    assert got == {42: 0, 1: 0, 2: 1}


def test_early_exit_equals_full_unroll(spark):
    """A 3-node path exhausts at hop 2; max_hops=10 must early-exit
    with the identical result (fixpoint rounds are identities)."""
    e = spark.createDataFrame([(1, 2), (2, 3)], ["u", "v"])
    s = spark.createDataFrame([(1,)], ["node"])
    a = {r["node"]: r["dist"] for r in khop_distances(e, s, max_hops=2, small_graph_edges=0).collect()}
    b = {r["node"]: r["dist"] for r in khop_distances(e, s, max_hops=10, small_graph_edges=0).collect()}
    assert a == b == {1: 0, 2: 1, 3: 2}


def test_min_dist_not_first_path(spark):
    """Diamond + long tail: node 4 is reachable in 2 (via 1-2-4) and in
    3 (via 1-3-5-4); dist must be the MINIMUM."""
    e = spark.createDataFrame([(1, 2), (2, 4), (1, 3), (3, 5), (5, 4)], ["u", "v"])
    s = spark.createDataFrame([(1,)], ["node"])
    got = {r["node"]: r["dist"] for r in khop_distances(e, s, max_hops=3).collect()}
    assert got[4] == 2


def test_validation(spark):
    e = spark.createDataFrame([(1, 2)], ["u", "v"])
    s = spark.createDataFrame([(1,)], ["node"])
    with pytest.raises(ValueError, match=">= 0"):
        khop_distances(e, s, max_hops=-1)
