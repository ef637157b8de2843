"""Count-min sketch (operators/countmin.py): the Cormode-Muthukrishnan
guarantees hold and the sketch is exactly mergeable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.countmin import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _items(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "item string")


def _exact(vals):
    out: dict[str, int] = {}
    for v in vals:
        if v is not None:
            out[v] = out.get(v, 0) + 1
    return out


def test_never_underestimates_and_exact_when_wide(spark):
    # 26 distinct items, width 512 >> distinct: collisions possible but
    # the >= guarantee must hold for EVERY item; with 4 depths the min
    # lands on a collision-free row for all of them here.
    vals = [chr(ord("a") + i % 26) for i in range(400)]
    df = _items(spark, vals)
    sk = cms_build(df, "item", depth=4, width=512)
    probes = _items(spark, sorted(set(vals)))
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(sk, probes, "item", depth=4, width=512).collect()
    }
    exact = _exact(vals)
    for item, true_cnt in exact.items():
        assert est[item] >= true_cnt
    assert est == exact  # collision-free regime at this width


def test_overestimates_only_under_forced_collisions(spark):
    # width=2 forces heavy collisions: estimates must still be >= true.
    vals = [f"tok{i}" for i in range(50)] * 3
    df = _items(spark, vals)
    sk = cms_build(df, "item", depth=3, width=2)
    probes = _items(spark, [f"tok{i}" for i in range(50)])
    est = cms_estimate(sk, probes, "item", depth=3, width=2).collect()
    for r in est:
        assert r["est"] >= 3


def test_merge_equals_single_pass(spark):
    a = _items(spark, ["x", "y", "x", "z"])
    b = _items(spark, ["x", "z", "w"])
    both = a.unionByName(b)
    merged = cms_merge(
        cms_build(a, "item", depth=4, width=64),
        cms_build(b, "item", depth=4, width=64),
    )
    single = cms_build(both, "item", depth=4, width=64)
    assert sorted(merged.collect()) == sorted(single.collect())


def test_unseen_item_estimates_zero_and_nulls_excluded(spark):
    df = _items(spark, ["a", None, "b"])
    sk = cms_build(df, "item", depth=4, width=1024)
    # null input rows do not contribute counts
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 2 * 4
    probes = _items(spark, ["never-seen"])
    est = cms_estimate(sk, probes, "item", depth=4, width=1024).collect()
    assert est[0]["est"] == 0


def test_sketch_size_bounded(spark):
    vals = [f"v{i}" for i in range(1000)]
    sk = cms_build(_items(spark, vals), "item", depth=4, width=32)
    assert sk.count() <= 4 * 32


def test_bad_params_raise(spark):
    df = _items(spark, ["a"])
    with pytest.raises(ValueError):
        cms_build(df, "item", depth=0, width=16)
    with pytest.raises(ValueError):
        cms_merge()
