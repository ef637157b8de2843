"""ACF (operators/timeseries.acf): numpy replay, pair counts, edge
validation, seasonality detection on a planted periodic series."""

from __future__ import annotations

import math

import pytest

from usajobs_etl_service_spark.operators.timeseries import acf


def _py_acf(ys, max_lag):
    m = sum(ys) / len(ys)
    d = [y - m for y in ys]
    ssq = sum(x * x for x in d)
    out = {}
    for lag in range(1, max_lag + 1):
        pairs = list(zip(d, d[lag:]))
        out[lag] = (len(pairs), sum(a * b for a, b in pairs) / ssq)
    return out


def test_matches_python_replay(spark):
    ys = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    df = spark.createDataFrame([(i, y) for i, y in enumerate(ys)], ["t", "y"])
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in acf(df, order_col="t", value_col="y", max_lag=4).collect()
    }
    want = _py_acf(ys, 4)
    assert set(got) == set(want)
    for lag, (n, v) in want.items():
        assert got[lag][0] == n
        assert got[lag][1] == pytest.approx(v, abs=1e-12)


def test_detects_planted_period(spark):
    ys = [math.sin(2 * math.pi * i / 7) + 0.01 * i for i in range(70)]
    df = spark.createDataFrame([(i, y) for i, y in enumerate(ys)], ["t", "y"])
    got = {r["lag"]: r["acf"] for r in acf(df, order_col="t", value_col="y", max_lag=10).collect()}
    assert got[7] == max(got.values())  # the planted weekly period peaks
    assert got[7] > 0.8


def test_validation(spark):
    df = spark.createDataFrame([(0, 1.0)], ["t", "y"])
    with pytest.raises(ValueError, match=">= 1"):
        acf(df, order_col="t", value_col="y", max_lag=0)
