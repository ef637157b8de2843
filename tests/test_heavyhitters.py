"""Misra-Gries + exact-verify heavy hitters (operators/heavyhitters.py)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.heavyhitters import (
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _items(spark, values, partitions=8):
    return spark.createDataFrame(
        [(v,) for v in values], "item string"
    ).repartition(partitions)


def test_exact_on_skewed_stream(spark):
    # hot items spread across partitions + a long uniform tail
    values = ["hot_a"] * 400 + ["hot_b"] * 150 + [f"tail{i}" for i in range(450)]
    df = _items(spark, values)
    phi = 0.1  # threshold 100 of N=1000
    got = {
        r["item"]: r["cnt"] for r in heavy_hitters_exact(df, "item", phi=phi).collect()
    }
    exact = Counter(values)
    want = {t: c for t, c in exact.items() if c > phi * len(values)}
    assert got == want


def test_no_false_negatives_guarantee(spark):
    # Adversarial: heavy item interleaved with many distincts so naive
    # local top-k would evict it; the MG bound must keep it reachable.
    values = []
    for i in range(2000):
        values.append(f"noise{i}")
        if i % 4 == 0:
            values.append("needle")  # 500 of N=2500 => freq 0.2
    df = _items(spark, values, partitions=16)
    got = {r["item"] for r in heavy_hitters_exact(df, "item", phi=0.15).collect()}
    assert got == {"needle"}


def test_candidate_superset_bound(spark):
    # Every item with count > N/(k+1) must appear in the candidate union.
    values = ["x"] * 300 + ["y"] * 200 + [f"t{i}" for i in range(500)]
    df = _items(spark, values)
    k = 10
    cands = {
        r["item"] for r in misra_gries_candidates(df, "item", k=k).distinct().collect()
    }
    n = len(values)
    for item, cnt in Counter(values).items():
        if cnt > n / (k + 1):
            assert item in cands, f"{item} (cnt={cnt}) missing from candidates"


def test_threshold_is_strict_and_exact(spark):
    # count == phi*N exactly must be EXCLUDED (strict >); phi=0.125 is
    # binary-exact so the boundary product is exactly 10.0.
    values = ["a"] * 10 + ["b"] * 11 + ["c"] * 59
    df = _items(spark, values, partitions=2)
    got = {r["item"]: r["cnt"] for r in heavy_hitters_exact(df, "item", phi=0.125).collect()}
    assert got == {"b": 11, "c": 59}


def test_param_validation(spark):
    df = _items(spark, ["a"])
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "item", phi=0.0)
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "item", phi=0.5, k=0)
    with pytest.raises(ValueError):
        misra_gries_candidates(df, "item", k=0)


def test_no_full_domain_shuffle(spark):
    # The exact-count aggregate runs on the semi-joined sliver: the
    # plan must contain a broadcast join feeding the final aggregate.
    values = ["hh"] * 50 + [f"t{i}" for i in range(50)]
    df = _items(spark, values)
    plan = heavy_hitters_exact(df, "item", phi=0.3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_null_items_excluded_from_n_and_output(spark):
    """NULLs are dropped up front (ADVICE r6): N is the non-null count
    — so the phi*N threshold is not inflated by NULLs — and a frequent
    NULL is deliberately never reported (it cannot survive the
    candidate pass or the semi-join anyway; now that's a contract, not
    an accident)."""
    # 10 nulls + 9x"a" + 3x"b": non-null N=12, phi=0.5 -> threshold 6
    vals = [None] * 10 + ["a"] * 9 + ["b"] * 3
    out = {r["item"]: r["cnt"] for r in heavy_hitters_exact(_items(spark, vals), "item", phi=0.5).collect()}
    # with NULLs counted in N (22), threshold would be 11 and "a" lost
    assert out == {"a": 9}
