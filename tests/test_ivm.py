"""Incremental aggregate maintenance (operators/ivm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.ivm import merge_aggregates, partial_aggregate

SPEC = {"n": "count:", "s": "sum:v", "lo": "min:v", "hi": "max:v"}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _collect(df):
    return {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in df.collect()}


def test_merged_partials_equal_full_recompute(spark):
    a = _rows(spark, [("x", 1.0), ("x", 2.0), ("y", 5.0)])
    b = _rows(spark, [("x", 3.0), ("z", -1.0)])
    c = _rows(spark, [("y", 0.5), ("z", 4.0), ("z", 4.0)])
    parts = [partial_aggregate(d, ["k"], SPEC) for d in (a, b, c)]
    merged = merge_aggregates(parts, ["k"], SPEC)
    full = partial_aggregate(a.unionByName(b).unionByName(c), ["k"], SPEC)
    assert _collect(merged) == _collect(full)


def test_merge_is_associative_in_batching(spark):
    a = _rows(spark, [("x", 1.0)])
    b = _rows(spark, [("x", 2.0)])
    c = _rows(spark, [("x", 3.0)])
    pa, pb, pc = (partial_aggregate(d, ["k"], SPEC) for d in (a, b, c))
    left = merge_aggregates([merge_aggregates([pa, pb], ["k"], SPEC), pc], ["k"], SPEC)
    right = merge_aggregates([pa, merge_aggregates([pb, pc], ["k"], SPEC)], ["k"], SPEC)
    assert _collect(left) == _collect(right) == {"x": (3, 6.0, 1.0, 3.0)}


def test_key_only_in_one_partial_survives(spark):
    pa = partial_aggregate(_rows(spark, [("only_a", 7.0)]), ["k"], SPEC)
    pb = partial_aggregate(_rows(spark, [("only_b", 9.0)]), ["k"], SPEC)
    got = _collect(merge_aggregates([pa, pb], ["k"], SPEC))
    assert got == {"only_a": (1, 7.0, 7.0, 7.0), "only_b": (1, 9.0, 9.0, 9.0)}


def test_non_distributive_rejected(spark):
    df = _rows(spark, [("x", 1.0)])
    with pytest.raises(ValueError, match="distributive"):
        partial_aggregate(df, ["k"], {"d": "avg:v"})
    with pytest.raises(ValueError, match="distributive"):
        merge_aggregates([df.groupBy("k").agg(F.avg("v").alias("d"))], ["k"], {"d": "avg:v"})
    with pytest.raises(ValueError, match="at least one"):
        merge_aggregates([], ["k"], SPEC)
