"""Declarative expectations (operators/expectations.py) + exact join
cardinality pricing (salting.join_cardinality_report)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.expectations import (
    expect_report,
    fk_violations,
)
from usajobs_etl_service_spark.operators.salting import join_cardinality_report


@pytest.fixture()
def facts(spark):
    return spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (3, None, "bad"), (None, 7.0, "ok")],
        ["k", "price", "status"],
    )


def test_expect_report_false_and_null_both_violate(spark, facts):
    rows = {
        r["rule"]: r
        for r in expect_report(
            facts,
            [
                ("price_positive", F.col("price") > 0),
                ("status_ok", F.col("status") == "ok"),
                ("k_nonnull", F.col("k").isNotNull()),
            ],
        ).collect()
    }
    # -5 is FALSE, NULL price is NULL -> both violate
    assert rows["price_positive"]["n_violations"] == 2
    assert rows["price_positive"]["pass"] is False
    assert rows["status_ok"]["n_violations"] == 1
    assert rows["k_nonnull"]["n_violations"] == 1
    assert all(r["n_rows"] == 4 for r in rows.values())
    # order preserved via rule_seq
    assert [r["rule_seq"] for r in sorted(rows.values(), key=lambda r: r["rule_seq"])] == [0, 1, 2]


def test_expect_report_validation(spark, facts):
    with pytest.raises(ValueError, match="at least one"):
        expect_report(facts, [])
    with pytest.raises(ValueError, match="duplicate"):
        expect_report(facts, [("a", F.lit(True)), ("a", F.lit(True))])


def test_fk_violations_counts_nulls_and_missing(spark, facts):
    dim = spark.createDataFrame([(1,), (2,)], ["id"])
    r = fk_violations(facts, dim, fact_key="k", dim_key="id", rule="fk").first()
    # k=3 missing from dim, k=NULL dangling -> 2 violations
    assert (r["rule_seq"], r["n_rows"], r["n_violations"], r["pass"]) == (-1, 4, 2, False)


def test_join_cardinality_exact_vs_real_join(spark):
    left = spark.createDataFrame(
        [(k, i) for k in [1, 1, 1, 2, 2, 3, None] for i in range(2)], ["k", "x"]
    )
    right = spark.createDataFrame([(1,), (1,), (2,), (4,), (None,)], ["rk"])
    rep = join_cardinality_report(
        left, right, left_key="k", right_key="rk", top_k=2
    ).collect()
    total = [r for r in rep if r["key"] is None][0]
    real = left.join(right, left.k == right.rk).count()
    assert total["out_rows"] == real  # exact, not an estimate
    top = [r for r in rep if r["key"] is not None]
    assert [r["key"] for r in top] == [1, 2]  # 6*2=12 then 4*1=4
    assert top[0]["out_rows"] == 12
