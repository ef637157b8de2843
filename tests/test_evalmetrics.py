"""exact_auc / mann_whitney / calibration_report vs pure-Python
references (textbook average-rank formulas, no scipy dependency)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.evalmetrics import (
    calibration_report,
    exact_auc,
)
from usajobs_etl_service_spark.operators.profiling import mann_whitney_u


def _avg_ranks_py(values):
    """value -> average rank (1-based) over the pooled list."""
    s = sorted(values)
    ranks: dict[float, float] = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2  # mean of ranks i+1 .. j
        i = j
    return ranks


def _auc_py(pairs):
    ranks = _avg_ranks_py([s for s, _ in pairs])
    pos = [s for s, y in pairs if y == 1]
    n_pos, n_neg = len(pos), len(pairs) - len(pos)
    r_pos = sum(ranks[s] for s in pos)
    return (r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def _mw_py(a_vals, b_vals):
    pooled = list(a_vals) + list(b_vals)
    ranks = _avg_ranks_py(pooled)
    n_a, n_b, n = len(a_vals), len(b_vals), len(pooled)
    r_a = sum(ranks[v] for v in a_vals)
    u_a = r_a - n_a * (n_a + 1) / 2
    ties: dict[float, int] = {}
    for v in pooled:
        ties[v] = ties.get(v, 0) + 1
    t = sum(c * c * c - c for c in ties.values())
    var_u = n_a * n_b / 12 * ((n + 1) - t / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2) / math.sqrt(var_u)
    return u_a, z


def _df(spark, pairs):
    return spark.createDataFrame(
        [(i, float(s), int(y)) for i, (s, y) in enumerate(pairs)],
        "id long, score double, y int",
    )


def test_auc_perfect_separation(spark):
    pairs = [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)]
    row = exact_auc(_df(spark, pairs), "score", "y").collect()[0]
    assert (row.n_pos, row.n_neg, row.auc) == (2, 2, 1.0)


def test_auc_constant_score_is_half(spark):
    pairs = [(0.5, y) for y in (0, 1, 0, 1, 1)]
    row = exact_auc(_df(spark, pairs), "score", "y").collect()[0]
    assert row.auc == 0.5


def test_auc_with_ties_matches_python(spark):
    # deterministic pseudo-random mix with heavy ties
    pairs = [(((i * 7) % 5) / 4.0, (i * 3) % 2) for i in range(40)]
    row = exact_auc(_df(spark, pairs), "score", "y").collect()[0]
    assert row.auc == pytest.approx(round(_auc_py(pairs), 6), abs=1e-9)
    assert row.n_pos == sum(1 for _, y in pairs if y)
    assert row.n_neg == sum(1 for _, y in pairs if not y)


def test_auc_monotone_transform_invariant(spark):
    pairs = [(((i * 13) % 17) / 16.0, (i * 5) % 2) for i in range(30)]
    base = exact_auc(_df(spark, pairs), "score", "y").collect()[0].auc
    warped = [(math.exp(3 * s), y) for s, y in pairs]
    same = exact_auc(_df(spark, warped), "score", "y").collect()[0].auc
    assert base == same


def test_auc_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(0, 0.9, 1), (1, 0.1, 0), (2, None, 1), (3, 0.5, None)],
        "id long, score double, y int",
    )
    row = exact_auc(df, "score", "y").collect()[0]
    assert (row.n_pos, row.n_neg, row.auc) == (1, 1, 1.0)


def test_mann_whitney_matches_python(spark):
    a = [12.0, 15.0, 15.0, 18.0, 20.0, 11.0]
    b = [9.0, 15.0, 13.0, 10.0, 18.0, 8.0, 14.0]
    rows = [(i, v, "A") for i, v in enumerate(a)] + [
        (100 + i, v, "B") for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(rows, "id long, v double, grp string")
    row = mann_whitney_u(
        df, value_col="v", label_col="grp", label_a="A", label_b="B"
    ).collect()[0]
    u_ref, z_ref = _mw_py(a, b)
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert row.u_stat == pytest.approx(round(u_ref, 4), abs=1e-9)
    assert row.z == pytest.approx(round(z_ref, 6), abs=1e-9)


def test_mann_whitney_ignores_other_groups_and_nulls(spark):
    rows = [
        (0, 1.0, "A"),
        (1, 2.0, "A"),
        (2, 3.0, "B"),
        (3, 4.0, "C"),  # third group: excluded
        (4, None, "A"),  # NULL value: excluded
    ]
    df = spark.createDataFrame(rows, "id long, v double, grp string")
    row = mann_whitney_u(
        df, value_col="v", label_col="grp", label_a="A", label_b="B"
    ).collect()[0]
    assert (row.n_a, row.n_b) == (2, 1)
    u_ref, _ = _mw_py([1.0, 2.0], [3.0])
    assert row.u_stat == u_ref


def test_calibration_perfectly_calibrated(spark):
    # bin 2: score 0.25, 1 of 4 positive -> acc 0.25 == conf -> gap 0
    rows = [(i, 0.25, 1 if i == 0 else 0) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, score double, y int")
    out = calibration_report(df, "score", "y", n_bins=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.bin, r.n, r.confidence, r.accuracy, r.abs_gap, r.ece) == (
        2,
        4,
        0.25,
        0.25,
        0.0,
        0.0,
    )
    # brier = mean((0.25 - y)^2) = (0.75^2 + 3 * 0.25^2) / 4
    assert r.brier == pytest.approx((0.75**2 + 3 * 0.25**2) / 4, abs=1e-9)


def test_calibration_bins_and_ece(spark):
    # two bins: [0.0, 0.1) all negative (gap = conf), top bin closed
    rows = [
        (0, 0.05, 0),
        (1, 0.05, 0),
        (2, 1.0, 1),  # score 1.0 must land in bin 9, not bin 10
        (3, 0.95, 0),
    ]
    df = spark.createDataFrame(rows, "id long, score double, y int")
    out = {r.bin: r for r in calibration_report(df, "score", "y", n_bins=10).collect()}
    assert set(out) == {0, 9}
    assert out[0].n == 2 and out[0].accuracy == 0.0 and out[0].abs_gap == 0.05
    assert out[9].n == 2 and out[9].accuracy == 0.5
    assert out[9].confidence == 0.975
    # ece = (2*0.05 + 2*0.475) / 4
    assert out[0].ece == pytest.approx(0.2625, abs=1e-9)


def test_calibration_out_of_domain_scores_clamped(spark):
    # scores outside the documented [0, 1] domain land in the boundary
    # bins (0 and n_bins-1) — never a negative or >= n_bins bin id
    rows = [(0, -0.3, 0), (1, 1.7, 1), (2, 0.55, 1)]
    df = spark.createDataFrame(rows, "id long, score double, y int")
    out = {r.bin: r for r in calibration_report(df, "score", "y", n_bins=10).collect()}
    assert sorted(out) == [0, 5, 9]
    assert out[0].n == 1 and out[9].n == 1


def test_auc_is_one_lazy_plan(spark):
    """Construction must run no job (the skew_safe_join lesson)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 10).cast("double").alias("score"),
        (F.col("id") % 2).cast("int").alias("y"),
    )
    out = exact_auc(df, "score", "y")
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert before == after
    assert out.collect()[0].n_pos == 50


def test_threshold_sweep_counts_and_metrics(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import threshold_sweep

    pairs = [(0.1, 0), (0.2, 0), (0.3, 1), (0.6, 0), (0.7, 1), (0.9, 1)]
    out = {
        r.threshold: r
        for r in threshold_sweep(_df(spark, pairs), "score", "y", [0.5, 0.95]).collect()
    }
    r5 = out[0.5]
    assert (r5.tp, r5.fp, r5.fn) == (2, 1, 1)
    assert r5.precision == pytest.approx(2 / 3, abs=1e-6)
    assert r5.recall == pytest.approx(2 / 3, abs=1e-6)
    assert r5.f1 == pytest.approx(2 / 3, abs=1e-6)
    # no predicted positives at 0.95 -> NULL precision/f1, recall 0
    r95 = out[0.95]
    assert (r95.tp, r95.fp, r95.fn) == (0, 0, 3)
    assert r95.precision is None and r95.f1 is None and r95.recall == 0.0


def test_threshold_sweep_validation(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import threshold_sweep

    with pytest.raises(ValueError):
        threshold_sweep(_df(spark, [(0.5, 1)]), "score", "y", [])


def test_cohen_kappa_textbook(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import cohen_kappa

    # classic 2x2: n11=20, n00=15, n10=5, n01=10 -> po=0.7,
    # pe=(25*30 + 25*20)/50^2 = 0.5, kappa = 0.4
    rows = (
        [(1, 1)] * 20 + [(0, 0)] * 15 + [(1, 0)] * 5 + [(0, 1)] * 10
    )
    df = spark.createDataFrame(rows, "a int, b int")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert (r.n, r.n_both, r.n_neither, r.n_only_a, r.n_only_b) == (50, 20, 15, 5, 10)
    assert r.po == 0.7
    assert r.kappa == pytest.approx(0.4, abs=1e-9)


def test_cohen_kappa_degenerate_and_nulls(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import cohen_kappa

    # both raters constant -> pe = 1 -> NULL kappa; NULL rows excluded
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (None, 1), (1, None)], "a int, b int"
    )
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert (r.n, r.n_both, r.po, r.kappa) == (2, 2, 1.0, None)


def test_grouped_auc_matches_per_slice(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import exact_auc_by_group

    rows = [
        (i, "abc"[(i * 5) % 3], (((i * 7) % 9)) / 8.0, (i * 3) % 2)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, score double, y int")
    got = {
        r.grp: (r.n_pos, r.n_neg, r.auc)
        for r in exact_auc_by_group(df, "score", "y", "grp").collect()
    }
    for g in "abc":
        pairs = [(s, y) for _, gg, s, y in rows if gg == g]
        ref = exact_auc(_df(spark, pairs), "score", "y").collect()[0]
        assert got[g] == (ref.n_pos, ref.n_neg, ref.auc)


def test_grouped_auc_single_class_slice_is_null(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import exact_auc_by_group

    rows = [(0, "pos_only", 0.4, 1), (1, "pos_only", 0.6, 1),
            (2, "mixed", 0.2, 0), (3, "mixed", 0.8, 1)]
    df = spark.createDataFrame(rows, "id long, grp string, score double, y int")
    got = {r.grp: r for r in exact_auc_by_group(df, "score", "y", "grp").collect()}
    assert got["pos_only"].auc is None
    assert got["mixed"].auc == 1.0


def _ndcg_py(rows, k):
    import math as _m

    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))[:k]
    ideal = sorted(rows, key=lambda r: (-r[2], r[0]))[:k]
    dcg = sum(r[2] / _m.log2(i + 2) for i, r in enumerate(ranked))
    idcg = sum(r[2] / _m.log2(i + 2) for i, r in enumerate(ideal))
    return dcg, idcg, (dcg / idcg if idcg else None)


def test_ndcg_matches_python_graded(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import ndcg_at_k

    rows = [(i, ((i * 7) % 13) / 12.0, float((i * 5) % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, score double, rel double")
    r = ndcg_at_k(df, "score", "rel", "id", k=10).collect()[0]
    dcg, idcg, ndcg = _ndcg_py(rows, 10)
    assert (r.k, r.n_ranked) == (10, 10)
    assert r.dcg == pytest.approx(round(dcg, 6), abs=1e-9)
    assert r.idcg == pytest.approx(round(idcg, 6), abs=1e-9)
    assert r.ndcg == pytest.approx(round(ndcg, 6), abs=1e-9)


def test_ndcg_perfect_ranking_is_one(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import ndcg_at_k

    rows = [(i, 1.0 - i / 10.0, float(10 - i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, score double, rel double")
    assert ndcg_at_k(df, "score", "rel", "id", k=10).collect()[0].ndcg == 1.0


def test_ndcg_zero_relevance_is_null(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import ndcg_at_k

    rows = [(i, float(i), 0.0) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, score double, rel double")
    r = ndcg_at_k(df, "score", "rel", "id", k=5).collect()[0]
    assert r.ndcg is None and r.dcg == 0.0


def test_ndcg_k_validation(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import ndcg_at_k

    df = spark.createDataFrame([(1, 0.5, 1.0)], "id long, score double, rel double")
    with pytest.raises(ValueError):
        ndcg_at_k(df, "score", "rel", "id", k=0)


def _ap_py(pairs):
    """sklearn step-convention AP over (score, y) pairs: distinct
    thresholds descending, AP = sum dTP/P * precision_i."""
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for s, y in pairs:
        agg[s][0] += 1
        agg[s][1] += y
    P = sum(v[1] for v in agg.values())
    tp = n = 0
    ap = 0.0
    for s in sorted(agg, reverse=True):
        tie, pos = agg[s]
        n += tie
        tp += pos
        ap += pos / P * (tp / n)
    return ap


def test_average_precision_matches_python_reference(spark):
    import random

    from usajobs_etl_service_spark.operators.evalmetrics import average_precision

    rng = random.Random(11)
    # heavy ties: scores drawn from only 7 distinct values
    pairs = [(round(rng.choice([0.1, 0.2, 0.3, 0.5, 0.7, 0.8, 0.9]), 1),
              rng.randint(0, 1)) for _ in range(500)]
    df = spark.createDataFrame(
        [(i, s, y) for i, (s, y) in enumerate(pairs)], "id long, score double, y int"
    )
    row = average_precision(df, "score", "y").first()
    assert row["n"] == 500
    assert row["ap"] == pytest.approx(_ap_py(pairs), abs=2e-6)


def test_average_precision_perfect_and_degenerate(spark):
    from usajobs_etl_service_spark.operators.evalmetrics import average_precision

    # perfect separation -> AP 1.0
    rows = [(i, 0.9, 1) for i in range(5)] + [(i + 5, 0.1, 0) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, score double, y int")
    assert average_precision(df, "score", "y").first()["ap"] == 1.0
    # no positives -> NULL (try_divide), never Inf/NaN
    neg = spark.createDataFrame(
        [(i, 0.5, 0) for i in range(4)], "id long, score double, y int"
    )
    r = average_precision(neg, "score", "y").first()
    assert r["n_pos"] == 0 and r["ap"] is None
