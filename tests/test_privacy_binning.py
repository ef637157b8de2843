"""k-anonymity/l-diversity audit (operators/privacy.py) and equi-depth
binning (encoding.quantile_bin)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.encoding import quantile_bin
from usajobs_etl_service_spark.operators.privacy import (
    kanonymity_classes,
    kanonymity_summary,
)


@pytest.fixture()
def people(spark):
    rows = (
        [("10001", "F", "flu") for _ in range(5)]
        + [("10001", "M", "flu"), ("10001", "M", "cold")]  # class of 2
        + [("99999", "F", "rare")]  # singleton, homogeneous
    )
    return spark.createDataFrame(rows, ["zip", "sex", "dx"])


def test_classes_and_flags(spark, people):
    got = {
        (r["zip"], r["sex"]): (r["n"], r["n_sensitive"], r["k_ok"], r["l_ok"])
        for r in kanonymity_classes(
            people, ["zip", "sex"], k=3, sensitive_col="dx", l=2
        ).collect()
    }
    assert got[("10001", "F")] == (5, 1, True, False)  # k ok, homogeneous
    assert got[("10001", "M")] == (2, 2, False, True)
    assert got[("99999", "F")] == (1, 1, False, False)


def test_summary(spark, people):
    classes = kanonymity_classes(people, ["zip", "sex"], k=3, sensitive_col="dx", l=2)
    s = kanonymity_summary(classes, k=3).first()
    assert s["n_classes"] == 3 and s["n_rows"] == 8
    assert s["n_violating_classes"] == 2 and s["rows_at_risk"] == 3
    assert s["table_k"] == 1
    assert s["n_homogeneous_classes"] == 2


def test_null_quasi_values_form_classes(spark):
    df = spark.createDataFrame([(None, "a"), (None, "a"), ("x", "a")], ["zip", "dx"])
    got = {r["zip"]: r["n"] for r in kanonymity_classes(df, ["zip"], k=2).collect()}
    assert got[None] == 2 and got["x"] == 1


def test_privacy_validation(spark, people):
    with pytest.raises(ValueError, match="at least one"):
        kanonymity_classes(people, [])
    with pytest.raises(ValueError, match="sensitive_col"):
        kanonymity_classes(people, ["zip"], l=2)


def test_quantile_bin_equal_depth_and_bounds(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["y"])
    out = quantile_bin(df, value_col="y", n_bins=4)
    counts = {
        r["bin"]: r["n"]
        for r in out.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {0, 1, 2, 3}
    assert all(20 <= c <= 30 for c in counts.values())
    # monotone: bin of 0.0 < bin of 99.0
    vals = {r["y"]: r["bin"] for r in out.collect()}
    assert vals[0.0] == 0 and vals[99.0] == 3
    assert all(vals[a] <= vals[b] for a, b in zip(sorted(vals), sorted(vals)[1:]))


def test_quantile_bin_nulls_and_validation(spark):
    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], ["y"])
    got = {r["y"]: r["bin"] for r in quantile_bin(df, value_col="y", n_bins=2).collect()}
    assert got[None] is None
    with pytest.raises(ValueError, match=">= 2"):
        quantile_bin(df, value_col="y", n_bins=1)


def test_generalization_ladder_chooses_first_k_ok(spark):
    from usajobs_etl_service_spark.operators.privacy import generalization_ladder

    rows = [(z, s) for z in range(10) for s in "ab" for _ in range(3)]  # 20 classes of 3
    df = spark.createDataFrame(rows, ["zip", "seg"])
    levels = [
        ("zip x seg", [F.col("zip"), F.col("seg")]),      # min 3
        ("zip", [F.col("zip")]),                          # min 6
        ("all", [F.lit("*")]),                            # min 60
    ]
    got = {r["level"]: r for r in generalization_ladder(df, levels, k=5).collect()}
    assert (got[0]["min_class"], got[0]["k_ok"], got[0]["chosen"]) == (3, False, False)
    assert (got[1]["min_class"], got[1]["k_ok"], got[1]["chosen"]) == (6, True, True)
    assert (got[2]["k_ok"], got[2]["chosen"]) == (True, False)  # later ok levels not chosen


def test_generalization_ladder_none_qualify(spark):
    from usajobs_etl_service_spark.operators.privacy import generalization_ladder

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["zip", "seg"])
    got = generalization_ladder(df, [("zip", [F.col("zip")])], k=99).collect()
    assert got[0]["k_ok"] is False and got[0]["chosen"] is None
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one"):
        generalization_ladder(df, [], k=5)


def test_t_closeness_hand_emd(spark):
    """Hand-checkable two-class, two-value geometry: global is 50/50;
    a pure class has p=(1,0) -> |cumP-cumQ| at value 1 = 0.5, m-1=1 ->
    emd 0.5, tvd 0.5; a balanced class has emd 0. Absent values must
    move mass (the dense-grid requirement)."""
    from usajobs_etl_service_spark.operators.privacy import t_closeness_report

    rows = (
        [("pure", "a")] * 4                     # class 'pure': all a
        + [("bal", "a")] * 2 + [("bal", "b")] * 2  # class 'bal': 50/50
        + [("none", "b")] * 4                   # class 'none': all b
    )
    df = spark.createDataFrame(rows, "g string, s string")
    out = {r["g"]: r for r in t_closeness_report(df, ["g"], "s", t=0.2).collect()}
    assert out["bal"].emd == 0.0 and out["bal"].tvd == 0.0 and out["bal"].t_ok
    assert out["pure"].emd == 0.5 and out["pure"].tvd == 0.5 and not out["pure"].t_ok
    # 'none' has value 'a' absent entirely -> p=0 row still counted
    assert out["none"].emd == 0.5 and not out["none"].t_ok


def test_t_closeness_ordered_metric_beats_tvd(spark):
    """Three ordered values: a class concentrated at the far end has
    HIGHER EMD than one concentrated in the middle at the same TVD —
    the ordered ground metric is the point of t-closeness."""
    from usajobs_etl_service_spark.operators.privacy import t_closeness_report

    rows = (
        [("far", "v3")] * 3
        + [("mid", "v2")] * 3
        + [("g", "v1"), ("g", "v2"), ("g", "v3")] * 3  # keeps global uniform-ish
    )
    df = spark.createDataFrame(rows, "g string, s string")
    out = {r["g"]: r for r in t_closeness_report(df, ["g"], "s", t=0.5).collect()}
    assert out["far"].tvd == out["mid"].tvd
    assert out["far"].emd > out["mid"].emd


def test_t_closeness_validation(spark):
    import pytest

    from usajobs_etl_service_spark.operators.privacy import t_closeness_report

    df = spark.createDataFrame([("a", "x")], "g string, s string")
    with pytest.raises(ValueError, match="quasi"):
        t_closeness_report(df, [], "s")
    with pytest.raises(ValueError, match="t must"):
        t_closeness_report(df, ["g"], "s", t=0.0)


def test_t_closeness_single_support_value(spark):
    """m=1 degenerate support (round-11 ADVICE): one global sensitive
    value means every class trivially matches the one-point global
    distribution — emd must be 0 and t_ok True, not NULL/Inf from a
    division by m-1=0."""
    from usajobs_etl_service_spark.operators.privacy import t_closeness_report

    rows = [("g1", "only")] * 3 + [("g2", "only")] * 2
    df = spark.createDataFrame(rows, "g string, s string")
    out = {r["g"]: r for r in t_closeness_report(df, ["g"], "s", t=0.2).collect()}
    assert len(out) == 2
    for r in out.values():
        assert r.emd == 0.0 and r.tvd == 0.0 and r.t_ok
