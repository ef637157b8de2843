"""Binned range join: exact parity with the naive non-equi join, plan
shape (hash equi-join, no nested-loop), edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.rangejoin import point_in_interval_join


def _frames(spark):
    points = spark.createDataFrame([(i, i * 7 % 100) for i in range(200)], "pid long, p long")
    intervals = spark.createDataFrame(
        [(j, j * 11 % 90, j * 11 % 90 + (j % 4) * 5) for j in range(40)], "iid long, s long, e long"
    )
    return points, intervals


def test_matches_naive_join(spark):
    points, intervals = _frames(spark)
    got = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            points, intervals, point_col="p", start_col="s", end_col="e", bin_size=8
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.join(
            intervals, (F.col("p") >= F.col("s")) & (F.col("p") < F.col("e"))
        ).collect()
    }
    assert got == naive and len(got) > 0


def test_no_duplicate_matches_across_buckets(spark):
    # interval spanning many buckets still matches a point exactly once
    points = spark.createDataFrame([(1, 50)], "pid long, p long")
    intervals = spark.createDataFrame([(1, 0, 1000)], "iid long, s long, e long")
    rows = point_in_interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e", bin_size=8
    ).collect()
    assert len(rows) == 1


def test_half_open_and_empty_intervals(spark):
    points = spark.createDataFrame([(1, 10), (2, 20)], "pid long, p long")
    intervals = spark.createDataFrame([(1, 10, 20), (2, 30, 30)], "iid long, s long, e long")
    rows = point_in_interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e", bin_size=4
    ).collect()
    assert [(r["pid"], r["iid"]) for r in rows] == [(1, 1)]  # 20 excluded (half-open); empty interval never matches


def test_plan_is_hash_equi_join(spark):
    points, intervals = _frames(spark)
    df = point_in_interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e", bin_size=8
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_rejects_bad_bin(spark):
    points, intervals = _frames(spark)
    with pytest.raises(ValueError):
        point_in_interval_join(points, intervals, point_col="p", start_col="s", end_col="e", bin_size=0)
