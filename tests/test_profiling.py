"""Semantic tests for operators/profiling.py (cross-engine equality is
the q101/q102 oracle-parity rows)."""

from __future__ import annotations

import pytest

from usajobs_etl_service_spark.operators.profiling import profile, zscore_anomalies


def test_profile_metrics(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "aa"), (2, None, "bbbb"), (3, 30.0, None), (4, 10.0, "aa")],
        "id long, x double, s string",
    )
    out = profile(df, numeric_cols=["x"], string_cols=["s"])
    got = {(r["column_name"], r["metric"]): r["value"] for r in out.collect()}
    assert got[("x", "n")] == 4.0
    assert got[("x", "n_null")] == 1.0
    assert got[("x", "n_distinct")] == 2.0
    assert got[("x", "min")] == 10.0 and got[("x", "max")] == 30.0
    assert got[("x", "mean")] == round(50.0 / 3, 4)
    assert got[("s", "n_null")] == 1.0
    assert got[("s", "n_distinct")] == 2.0
    assert got[("s", "avg_len")] == round(8.0 / 3, 4)
    assert got[("s", "max_len")] == 4.0


def test_profile_approx_mode_and_empty_args(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        profile(df)
    out = profile(df, numeric_cols=["id"], exact_distinct=False)
    got = {(r["column_name"], r["metric"]): r["value"] for r in out.collect()}
    assert got[("id", "n_distinct")] == 1.0  # HLL exact at tiny cardinality


def test_zscore_flags_only_true_outliers(spark):
    # user 7: ten values at 1.0 and one at 100 -> the spike is >3 sd out;
    # user 8: constant (sd=0) must produce no flags and no division error.
    rows = [(i, 7, 1.0) for i in range(10)] + [(99, 7, 100.0)]
    rows += [(200 + i, 8, 5.0) for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    out = zscore_anomalies(df, threshold=3.0).collect()
    assert [(r["event_id"], r["user_id"]) for r in out] == [(99, 7)]
    assert out[0]["z"] > 3.0


def test_zscore_single_row_entity_no_flags(spark):
    df = spark.createDataFrame([(1, 7, 42.0)], "event_id long, user_id long, value double")
    assert zscore_anomalies(df).collect() == []

def test_mann_whitney_hand_computed(spark):
    """Hand-check with ties: a = {1, 2, 2}, b = {2, 3}.
    Pooled midranks: 1 -> 1; 2,2,2 -> 3; 3 -> 5. R_a = 1 + 3 + 3 = 7,
    U = 7 - 3*4/2 = 1; mu = 3; tie_sum = 3^3 - 3 = 24;
    sigma = sqrt(6/12 * (6 - 24/20)) = sqrt(2.4)."""
    import math

    from usajobs_etl_service_spark.operators.profiling import mann_whitney_u

    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0), ("x", 99.0)]
    df = spark.createDataFrame(rows, "lab string, v double")
    got = mann_whitney_u(
        df, value_col="v", label_col="lab", label_a="a", label_b="b"
    ).collect()[0]
    assert got["n_a"] == 3 and got["n_b"] == 2
    assert got["u_stat"] == 1.0
    assert got["z"] == round((1.0 - 3.0) / math.sqrt(2.4), 6)


def test_mann_whitney_shift_direction(spark):
    """A clearly shifted group gives a large-magnitude z with the
    expected sign (a below b -> negative U deviation -> negative z)."""
    from usajobs_etl_service_spark.operators.profiling import mann_whitney_u

    rows = [("a", float(i)) for i in range(50)] + [("b", float(i + 100)) for i in range(50)]
    df = spark.createDataFrame(rows, "lab string, v double")
    got = mann_whitney_u(
        df, value_col="v", label_col="lab", label_a="a", label_b="b"
    ).collect()[0]
    assert got["u_stat"] == 0.0  # total separation
    assert got["z"] < -8


def test_profile_table_approx_no_expand(spark):
    """approx=True must plan WITHOUT the multi-distinct Expand (which
    multiplies every row by profiled_cols + 1 — a 17x row stream for a
    16-column profile at 100 TB); exact mode keeps it (the price of
    exactness). Values: nulls/extrema identical, distincts within
    HLL++ tolerance."""
    from usajobs_etl_service_spark.operators.profiling import profile_table

    df = spark.range(5_000).selectExpr(
        "id", "cast(id % 97 as string) as s", "id % 13 as m"
    )
    exact = profile_table(df, ["id", "s", "m"])
    approx = profile_table(df, ["id", "s", "m"], approx=True)
    p_exact = exact._jdf.queryExecution().executedPlan().toString()
    p_approx = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in p_exact
    assert "Expand" not in p_approx, p_approx[:600]
    e = {r["column"]: r for r in exact.collect()}
    a = {r["column"]: r for r in approx.collect()}
    for c in ("id", "s", "m"):
        assert (a[c]["n_rows"], a[c]["n_nulls"]) == (e[c]["n_rows"], e[c]["n_nulls"])
        assert (a[c]["min_value"], a[c]["max_value"]) == (e[c]["min_value"], e[c]["max_value"])
        assert abs(a[c]["n_distinct"] - e[c]["n_distinct"]) <= max(2, 0.15 * e[c]["n_distinct"])  # ~3 sigma at rsd 0.05
