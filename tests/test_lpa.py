"""Deterministic label propagation (graphrank.label_propagation)."""

from __future__ import annotations

import pytest

from usajobs_etl_service_spark.operators.graphrank import label_propagation


def _py_lpa(edges, rounds):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in labels:
            votes = {}
            for m in adj[n]:
                votes[labels[m]] = votes.get(labels[m], 0) + 1
            new[n] = (
                min(votes, key=lambda l: (-votes[l], l)) if votes else labels[n]
            )
        labels = new
    return labels


@pytest.fixture()
def two_cliques(spark):
    # two 4-cliques joined by one bridge edge
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = c1 + c2 + [(3, 10)]
    return edges, spark.createDataFrame(edges, ["u", "v"])


def test_matches_python_replay_and_finds_communities(spark, two_cliques):
    edges, df = two_cliques
    got = {r["node"]: r["label"] for r in label_propagation(df, rounds=3).collect()}
    assert got == _py_lpa(edges, 3)
    # the two cliques converge to the min-id label of each
    assert {got[0], got[1], got[2]} == {0}
    assert {got[11], got[12], got[13]} == {10}


def test_deterministic_across_runs(spark, two_cliques):
    _, df = two_cliques
    a = sorted(map(tuple, label_propagation(df, rounds=2).collect()))
    b = sorted(map(tuple, label_propagation(df, rounds=2).collect()))
    assert a == b


def test_validation(spark, two_cliques):
    _, df = two_cliques
    with pytest.raises(ValueError, match=">= 1"):
        label_propagation(df, rounds=0)
