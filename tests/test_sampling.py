"""Deterministic sampling: reproducibility, rate accuracy, stratified
weights, and stability under repartitioning (where df.sample fails)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.sampling import hash_sample, sample_key, stratified_sample
from usajobs_etl_service_spark.session import read_table


def test_deterministic_across_runs_and_partitioning(spark):
    df = spark.range(10_000)
    a = {r["id"] for r in hash_sample(df, 0.3, key_col="id").collect()}
    b = {r["id"] for r in hash_sample(df.repartition(17), 0.3, key_col="id").collect()}
    assert a == b  # partitioning-independent — df.sample() is not


def test_rate_accuracy(spark):
    df = spark.range(20_000)
    n = hash_sample(df, 0.25, key_col="id").count()
    assert abs(n / 20_000 - 0.25) < 0.02


def test_different_seeds_differ(spark):
    df = spark.range(5_000)
    a = {r["id"] for r in hash_sample(df, 0.5, key_col="id", seed=1).collect()}
    b = {r["id"] for r in hash_sample(df, 0.5, key_col="id", seed=2).collect()}
    assert a != b and abs(len(a) - len(b)) < 500


def test_stratified_rates(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    rates = {"click": 1.0, "view": 0.5, "error": 0.0}
    sampled = stratified_sample(events, "event_type", rates, key_col="event_id")
    got = {r["event_type"]: r["n"] for r in sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["event_type"]: r["n"] for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("click") == full["click"]  # rate 1.0 keeps all
    assert "error" not in got  # rate 0.0 drops all
    assert "signup" not in got  # default_rate 0.0
    assert 0.3 < got["view"] / full["view"] < 0.7  # ~0.5


def test_rejects_bad_rate(spark):
    df = spark.range(10)
    with pytest.raises(ValueError):
        hash_sample(df, 1.5, key_col="id")
    with pytest.raises(ValueError):
        stratified_sample(df, "id", {"x": -0.1}, key_col="id")


def test_adaptive_quality_gate_exact_matches_model(spark):
    from usajobs_etl_service_spark.operators.sampling import adaptive_quality_gate

    # two sources with different score baselines + ties at the cut
    rows = [("a", i, float(s)) for i, s in enumerate([1, 2, 2, 3, 4, 5, 6, 7])] + [
        ("b", 100 + i, float(s)) for i, s in enumerate([10, 20, 20, 20, 30, 40])
    ]
    df = spark.createDataFrame(rows, "src string, id long, score double")
    kept = {
        r["id"]
        for r in adaptive_quality_gate(df, group_col="src", score_col="score", keep_frac=0.75).collect()
    }
    # model: keep rows whose cume_dist (fraction of group rows with
    # score <= own) >= 0.25
    want = set()
    for src in ("a", "b"):
        grp = [(i, s) for g, i, s in rows if g == src]
        n = len(grp)
        for i, s in grp:
            cd = sum(1 for _, s2 in grp if s2 <= s) / n
            if cd >= 0.25:
                want.add(i)
    assert kept == want


def test_adaptive_quality_gate_approx_agrees_with_exact(spark, sf_dir):
    """The 100 TB shape (percentile_approx threshold join, no per-group
    sort) must agree with the exact window gate up to sketch error on
    the real documents table."""
    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.functions.text import quality_score
    from usajobs_etl_service_spark.operators.sampling import adaptive_quality_gate
    from usajobs_etl_service_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").withColumn("q", quality_score(F.col("text")))
    exact = {
        r["doc_id"]
        for r in adaptive_quality_gate(docs, group_col="source", score_col="q").collect()
    }
    approx = {
        r["doc_id"]
        for r in adaptive_quality_gate(docs, group_col="source", score_col="q", approx=True).collect()
    }
    # high accuracy on a small table -> near-identical keep sets
    sym = len(exact ^ approx)
    assert sym <= max(2, int(0.02 * len(exact))), (len(exact), len(approx), sym)


def test_adaptive_quality_gate_approx_has_no_window(spark, sf_dir):
    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.functions.text import quality_score
    from usajobs_etl_service_spark.operators.sampling import adaptive_quality_gate
    from usajobs_etl_service_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").withColumn("q", quality_score(F.col("text")))
    plan = (
        adaptive_quality_gate(docs, group_col="source", score_col="q", approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, "approx mode must not sort groups in a window"


def test_adaptive_quality_gate_sampled_threshold(spark):
    """threshold_sample estimates per-group cuts from a hash sample —
    the benched q81 shape. With large groups the sampled keep-fraction
    must land near keep_frac, and the keep set must mostly agree with
    the exact gate (the disagreement band is rows near the cut)."""
    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.operators.sampling import adaptive_quality_gate

    df = (
        spark.range(40_000)
        .withColumn("src", (F.col("id") % 4).cast("string"))
        # per-group shifted scores so a global threshold would be wrong
        .withColumn("score", F.sin(F.col("id")) + (F.col("id") % 4).cast("double"))
    )
    exact = {
        r["id"]
        for r in adaptive_quality_gate(df, group_col="src", score_col="score").collect()
    }
    sampled = {
        r["id"]
        for r in adaptive_quality_gate(
            df, group_col="src", score_col="score", approx=True,
            threshold_sample=0.1, sample_key_col="id",
        ).collect()
    }
    assert abs(len(sampled) / 40_000 - 0.75) < 0.03  # keep_frac honored
    assert len(exact ^ sampled) / len(exact) < 0.05  # near-cut band only


def test_adaptive_quality_gate_sampled_keeps_unsampled_groups(spark):
    """A group so small the hash sample misses it entirely must pass
    through ungated (left threshold join), not vanish."""
    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.operators.sampling import adaptive_quality_gate

    big = (
        spark.range(10_000)
        .withColumn("src", F.lit("big"))
        .withColumn("score", F.col("id").cast("double"))
    )
    tiny = spark.createDataFrame(
        [("tiny", 1_000_000, 0.5)], "src string, id long, score double"
    ).select("id", "src", "score")
    df = big.unionByName(tiny)
    kept = adaptive_quality_gate(
        df, group_col="src", score_col="score", approx=True,
        threshold_sample=0.001, sample_key_col="id",
    )
    srcs = {r["src"] for r in kept.select("src").distinct().collect()}
    assert "tiny" in srcs  # present even if its 1 row was never sampled


def test_adaptive_quality_gate_sampled_rejects_bad_args(spark):
    from usajobs_etl_service_spark.operators.sampling import adaptive_quality_gate

    df = spark.range(10).withColumn("score", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        adaptive_quality_gate(
            df, group_col="id", score_col="score", threshold_sample=0.5, sample_key_col="id"
        )  # sampling without approx
    with pytest.raises(ValueError):
        adaptive_quality_gate(
            df, group_col="id", score_col="score", approx=True, threshold_sample=0.5
        )  # no key col
    with pytest.raises(ValueError):
        adaptive_quality_gate(
            df, group_col="id", score_col="score", approx=True,
            threshold_sample=1.5, sample_key_col="id",
        )


def test_adaptive_quality_gate_null_group_parity(spark):
    """A NULL group is a real group in the exact (window) mode; the
    approx threshold join must not silently drop its rows."""
    from usajobs_etl_service_spark.operators.sampling import adaptive_quality_gate

    rows = [(None, i, float(i)) for i in range(8)] + [("a", 100 + i, float(i)) for i in range(8)]
    df = spark.createDataFrame(rows, "src string, id long, score double")
    exact = {
        r["id"] for r in adaptive_quality_gate(df, group_col="src", score_col="score").collect()
    }
    approx = {
        r["id"]
        for r in adaptive_quality_gate(df, group_col="src", score_col="score", approx=True).collect()
    }
    assert {i for i in exact if i < 100}, "exact mode must keep null-group rows"
    assert exact == approx


def test_unimax_all_uncapped_equal_share(spark):
    """Budget below every cap: everyone gets the equal share B/n."""
    from usajobs_etl_service_spark.operators.sampling import unimax_allocation

    rows = [("a", 100), ("b", 100), ("c", 800)]
    df = spark.createDataFrame(rows, "lang string, n long")
    got = {
        r["lang"]: r
        for r in unimax_allocation(
            df, group_col="lang", size_col="n", budget_frac=0.5, max_epochs=2.0
        ).collect()
    }
    # B = 500; caps 200/200/1600; 200*3 > 500 so nobody is capped
    for k in ("a", "b", "c"):
        assert got[k]["alloc_tokens"] == round(500 / 3, 4)
    assert got["a"]["epochs"] == round(500 / 3 / 100, 6)


def test_unimax_mixed_regime_waterfall(spark):
    """Hand-run of the paper's greedy: caps 100/100/800, B=500 ->
    a and b capped at 100, c absorbs the remaining 300; the budget is
    exactly spent."""
    from usajobs_etl_service_spark.operators.sampling import unimax_allocation

    rows = [("a", 100), ("b", 100), ("c", 800)]
    df = spark.createDataFrame(rows, "lang string, n long")
    got = {
        r["lang"]: r
        for r in unimax_allocation(
            df, group_col="lang", size_col="n", budget_frac=0.5, max_epochs=1.0
        ).collect()
    }
    assert got["a"]["alloc_tokens"] == 100.0 and got["b"]["alloc_tokens"] == 100.0
    assert got["c"]["alloc_tokens"] == 300.0
    assert sum(r["alloc_tokens"] for r in got.values()) == 500.0
    assert got["c"]["epochs"] == round(300 / 800, 6)


def test_unimax_budget_exceeds_all_caps(spark):
    """Budget above the total cap mass: every group pins at its cap
    and the surplus is (correctly) unspendable."""
    from usajobs_etl_service_spark.operators.sampling import unimax_allocation

    rows = [("a", 10), ("b", 20)]
    df = spark.createDataFrame(rows, "lang string, n long")
    got = {
        r["lang"]: r
        for r in unimax_allocation(
            df, group_col="lang", size_col="n", budget_frac=10.0, max_epochs=2.0
        ).collect()
    }
    assert got["a"]["alloc_tokens"] == 20.0 and got["b"]["alloc_tokens"] == 40.0
    assert got["a"]["epochs"] == 2.0 and got["b"]["epochs"] == 2.0


def test_unimax_validation(spark):
    import pytest

    from usajobs_etl_service_spark.operators.sampling import unimax_allocation

    df = spark.createDataFrame([("a", 1)], "lang string, n long")
    with pytest.raises(ValueError):
        unimax_allocation(df, group_col="lang", size_col="n", budget_frac=0.0)
    with pytest.raises(ValueError):
        unimax_allocation(df, group_col="lang", size_col="n", max_epochs=-1.0)


def test_stratified_exact_fixed_n_and_determinism(spark):
    """Exactly n per stratum (whole stratum when smaller), identical
    sample on re-run, NULL strata/keys excluded."""
    from usajobs_etl_service_spark.operators.sampling import (
        stratified_sample_exact,
    )

    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(3)]
        + [(None, "a"), (5000, None)]
    )
    df = spark.createDataFrame(rows, "k long, s string")
    out = stratified_sample_exact(
        df, strata_col="s", key_col="k", n_per_stratum=10
    )
    got = out.collect()
    by_s = {}
    for r in got:
        by_s.setdefault(r["s"], []).append((r["sample_rank"], r["k"]))
    assert len(by_s["a"]) == 10          # big stratum cut to n
    assert len(by_s["b"]) == 3           # small stratum kept whole
    assert sorted(r for r, _ in by_s["a"]) == list(range(1, 11))
    # deterministic: identical ids on a second evaluation
    again = {
        (r["s"], r["sample_rank"], r["k"])
        for r in stratified_sample_exact(
            df, strata_col="s", key_col="k", n_per_stratum=10
        ).collect()
    }
    assert again == {(r["s"], r["sample_rank"], r["k"]) for r in got}
    # a different seed draws a different sample
    other = {
        r["k"]
        for r in stratified_sample_exact(
            df, strata_col="s", key_col="k", n_per_stratum=10, seed=7
        ).collect()
        if r["s"] == "a"
    }
    assert other != {k for _, k in by_s["a"]}


def test_stratified_exact_validation(spark):
    import pytest

    from usajobs_etl_service_spark.operators.sampling import (
        stratified_sample_exact,
    )

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError, match="n_per_stratum"):
        stratified_sample_exact(df, strata_col="s", key_col="k", n_per_stratum=0)
