"""trimmed_stats vs a pure-Python reference; spearman vs the textbook
formula (scipy-free)."""

from __future__ import annotations

import math

import pytest

from usajobs_etl_service_spark.operators.evalmetrics import spearman
from usajobs_etl_service_spark.operators.robust import trimmed_stats


def _trimmed_py(values, frac):
    s = sorted(values)
    n = len(s)
    k = int(math.floor(frac * n))
    kept = s[k : n - k]
    tm = sum(kept) / len(kept)
    wm = (sum(kept) + k * kept[0] + k * kept[-1]) / n
    return n, k, kept[0], kept[-1], round(tm, 4), round(wm, 4)


def test_trimmed_matches_python(spark):
    groups = {
        "a": [float((i * 17) % 101) for i in range(37)],
        "b": [float((i * 29) % 53) * 10 for i in range(24)],
    }
    rows = [
        (g_i * 1000 + i, g, v)
        for g_i, (g, vals) in enumerate(sorted(groups.items()))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {
        r.grp: (r.n, r.k_trimmed, r.lo_kept, r.hi_kept, r.trimmed_mean, r.winsorized_mean)
        for r in trimmed_stats(df, "v", "grp", "id", trim_frac=0.1).collect()
    }
    for g, vals in groups.items():
        assert got[g] == _trimmed_py(vals, 0.1)


def test_trimmed_outlier_immunity(spark):
    # one absurd outlier cannot move the 10%-trimmed mean
    base = [float(i) for i in range(1, 20)]  # mean 10
    rows = [(i, "g", v) for i, v in enumerate(base + [1e12])]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    r = trimmed_stats(df, "v", "grp", "id", trim_frac=0.1).collect()[0]
    assert r.k_trimmed == 2
    assert r.hi_kept == 18.0  # outlier and 19 trimmed off the top
    assert r.trimmed_mean == pytest.approx(sum(range(3, 19)) / 16, abs=1e-9)


def test_trimmed_zero_frac_is_plain_mean(spark):
    vals = [3.0, 1.0, 2.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, grp string, v double"
    )
    r = trimmed_stats(df, "v", "grp", "id", trim_frac=0.0).collect()[0]
    assert (r.k_trimmed, r.trimmed_mean, r.winsorized_mean) == (0, 2.0, 2.0)


def test_trimmed_validation(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, grp string, v double")
    with pytest.raises(ValueError):
        trimmed_stats(df, "v", "grp", "id", trim_frac=0.5)


def _spearman_py(pairs):
    def avg_ranks(vals):
        s = sorted(vals)
        first = {}
        for i, v in enumerate(s):
            first.setdefault(v, i + 1)
        cnt = {}
        for v in s:
            cnt[v] = cnt.get(v, 0) + 1
        return {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}

    rx = avg_ranks([x for x, _ in pairs])
    ry = avg_ranks([y for _, y in pairs])
    a = [rx[x] for x, _ in pairs]
    b = [ry[y] for _, y in pairs]
    n = len(pairs)
    sa, sb = sum(a), sum(b)
    sab = sum(x * y for x, y in zip(a, b))
    saa, sbb = sum(x * x for x in a), sum(y * y for y in b)
    return (n * sab - sa * sb) / math.sqrt(
        (n * saa - sa * sa) * (n * sbb - sb * sb)
    )


def test_spearman_perfect_monotone(spark):
    pairs = [(float(i), float(i * i)) for i in range(1, 20)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)], "id long, x double, y double"
    )
    r = spearman(df, "x", "y", "id").collect()[0]
    assert (r.n, r.rho) == (19, 1.0)


def test_spearman_ties_match_python(spark):
    pairs = [
        (float((i * 7) % 5), float((i * 11) % 7)) for i in range(50)
    ]  # heavy ties both sides
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)], "id long, x double, y double"
    )
    r = spearman(df, "x", "y", "id").collect()[0]
    assert r.rho == pytest.approx(round(_spearman_py(pairs), 6), abs=1e-9)


def test_spearman_constant_variable_is_null(spark):
    df = spark.createDataFrame(
        [(i, 1.0, float(i)) for i in range(5)], "id long, x double, y double"
    )
    assert spearman(df, "x", "y", "id").collect()[0].rho is None


def _median_py(vals):
    s = sorted(vals)
    n = len(s)
    lo, hi = s[(n + 1) // 2 - 1], s[n // 2]
    return (lo + hi) / 2


def test_grouped_median_mad_matches_python(spark):
    from usajobs_etl_service_spark.operators.robust import grouped_median_mad

    groups = {
        "odd": [float((i * 13) % 29) for i in range(21)],
        "even": [float((i * 7) % 40) for i in range(30)],
        "outliers": [8.0, 9.0, 10.0, 11.0, 12.0] * 4 + [500.0, -400.0],
    }
    rows = [
        (gi * 1000 + i, g, v)
        for gi, (g, vals) in enumerate(sorted(groups.items()))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {
        r.grp: r for r in grouped_median_mad(df, "v", "grp", "id").collect()
    }
    for g, vals in groups.items():
        med = _median_py(vals)
        mad = _median_py([abs(v - med) for v in vals])
        n_out = sum(
            1 for v in vals if mad > 0 and 0.6745 * abs(v - med) / mad > 3.5
        )
        r = got[g]
        assert (r.n, r.median, r.mad, r.n_outliers) == (len(vals), med, mad, n_out)
    assert got["outliers"].n_outliers == 2  # the planted 500 / -400


def test_grouped_median_mad_zero_mad_counts_nothing(spark):
    from usajobs_etl_service_spark.operators.robust import grouped_median_mad

    # majority-constant group: MAD 0 -> modified z undefined -> 0
    rows = [(i, "g", 5.0) for i in range(9)] + [(100, "g", 1e9)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    r = grouped_median_mad(df, "v", "grp", "id").collect()[0]
    assert (r.median, r.mad, r.n_outliers) == (5.0, 0.0, 0)


def _qcont_py(vals, q):
    s = sorted(vals)
    h = (len(s) - 1) * q + 1
    lo, hi = s[int(math.floor(h)) - 1], s[int(math.ceil(h)) - 1]
    return lo + (h - math.floor(h)) * (hi - lo)


def test_grouped_quantiles_matches_python(spark):
    from usajobs_etl_service_spark.operators.robust import grouped_quantiles

    groups = {
        "a": [float((i * 17) % 101) for i in range(37)],
        "b": [float((i * 29) % 53) * 10 for i in range(24)],
        "one": [42.0],
    }
    rows = [
        (gi * 1000 + i, g, v)
        for gi, (g, vals) in enumerate(sorted(groups.items()))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    fr = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {
        (r.grp, r.fraction): (r.n, r.value)
        for r in grouped_quantiles(df, "v", "grp", "id", fr).collect()
    }
    for g, vals in groups.items():
        for q in fr:
            n, v = got[(g, q)]
            assert n == len(vals)
            assert v == pytest.approx(round(_qcont_py(vals, q), 6), abs=1e-9)


def test_grouped_quantiles_spark_percentile_parity(spark):
    from usajobs_etl_service_spark.operators.robust import grouped_quantiles
    from pyspark.sql import functions as F

    rows = [(i, "g", float((i * 13) % 97)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {
        r.fraction: r.value
        for r in grouped_quantiles(df, "v", "grp", "id", [0.5, 0.9]).collect()
    }
    ref = df.agg(
        F.expr("percentile(v, 0.5)").alias("p50"),
        F.expr("percentile(v, 0.9)").alias("p90"),
    ).collect()[0]
    assert got[0.5] == pytest.approx(ref.p50, abs=1e-6)
    assert got[0.9] == pytest.approx(ref.p90, abs=1e-6)


def test_grouped_quantiles_validation(spark):
    from usajobs_etl_service_spark.operators.robust import grouped_quantiles

    df = spark.createDataFrame([(1, "g", 1.0)], "id long, grp string, v double")
    with pytest.raises(ValueError):
        grouped_quantiles(df, "v", "grp", "id", [])
    with pytest.raises(ValueError):
        grouped_quantiles(df, "v", "grp", "id", [1.5])


def test_grouped_quantiles_single_rank_pass_plan(spark):
    """Optimization-round contract: one rank pass serves every
    fraction. The earlier one-leg-per-fraction form re-evaluated the
    whole rank subtree per fraction (a Union of N legs in the plan);
    the HOF match + explode form has no Union and exactly one
    explode-generate."""
    from usajobs_etl_service_spark.operators.robust import grouped_quantiles

    rows = [(i, "g", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = grouped_quantiles(df, "v", "grp", "id", [0.25, 0.5, 0.75, 0.9, 0.99])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan, plan[:800]
    assert plan.count("Generate explode") == 1, plan[:800]
