"""Theil-Sen + Mann-Kendall (timeseries.robust_trend): Python replay,
outlier immunity, integer-exact MK statistic."""

from __future__ import annotations

import datetime
import math
from statistics import median

import pytest

from usajobs_etl_service_spark.operators.timeseries import robust_trend


def _py(xs, ys):
    pairs = [
        ((ys[j] - ys[i]) / (xs[j] - xs[i]), (ys[j] > ys[i]) - (ys[j] < ys[i]))
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    ]
    slope = median(p[0] for p in pairs)
    s = sum(p[1] for p in pairs)
    n = len(xs)
    z = s / math.sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
    return slope, median(y - slope * x for x, y in zip(xs, ys)), s, z


def test_matches_python_replay_numeric_x(spark):
    xs = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    ys = [1.0, 3.0, 2.0, 5.0, 4.0, 7.0, 6.0]
    df = spark.createDataFrame(list(zip(xs, ys)), ["t", "y"])
    r = robust_trend(df, order_col="t", value_col="y").first()
    slope, intercept, s, z = _py(xs, ys)
    assert r["n"] == 7
    assert r["slope"] == pytest.approx(slope, abs=1e-12)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-12)
    assert r["mk_s"] == s
    assert r["mk_z"] == pytest.approx(z, abs=1e-12)


def test_outlier_immunity_vs_ols(spark):
    """One corrupted point: OLS slope moves wildly, Theil-Sen holds."""
    xs = list(range(21))
    ys = [2.0 * x + 1.0 for x in xs]
    ys[20] = 1e6  # corruption at the endpoint (max OLS leverage)
    df = spark.createDataFrame([(float(x), y) for x, y in zip(xs, ys)], ["t", "y"])
    r = robust_trend(df, order_col="t", value_col="y").first()
    assert r["slope"] == pytest.approx(2.0, abs=0.05)
    n = len(xs)
    xm, ym = sum(xs) / n, sum(ys) / n
    ols = sum((x - xm) * (y - ym) for x, y in zip(xs, ys)) / sum(
        (x - xm) ** 2 for x in xs
    )
    assert abs(ols - 2.0) > 100  # OLS is destroyed by the same point


def test_date_order_col(spark):
    rows = [
        (datetime.date(2024, 1, d), float(d) * 3.0 + 10.0) for d in range(1, 11)
    ]
    df = spark.createDataFrame(rows, ["d", "y"])
    r = robust_trend(df, order_col="d", value_col="y").first()
    assert r["slope"] == pytest.approx(3.0, abs=1e-12)
    assert r["mk_s"] == 45  # all 45 pairs increasing


def test_constant_series(spark):
    df = spark.createDataFrame([(float(i), 5.0) for i in range(6)], ["t", "y"])
    r = robust_trend(df, order_col="t", value_col="y").first()
    assert r["slope"] == 0.0 and r["mk_s"] == 0 and r["mk_z"] == 0.0
    assert r["intercept"] == 5.0
