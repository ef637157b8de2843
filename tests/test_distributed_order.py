"""Distributed global ordering (operators/distributed_order.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.distributed_order import (
    global_row_number,
    ordered_cummin,
    ordered_cumsum,
)


def _df(spark, rows, schema="k long, v double"):
    return spark.createDataFrame(rows, schema).repartition(8)


def test_row_number_matches_sorted_order(spark):
    rng = random.Random(11)
    rows = [(i, rng.uniform(-100, 100)) for i in range(500)]
    df = _df(spark, rows)
    got = {
        r["k"]: r["global_rn"]
        for r in global_row_number(df, [F.col("v").asc(), F.col("k").asc()]).collect()
    }
    want = {
        k: i + 1
        for i, (k, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


def test_row_number_desc_with_ties(spark):
    rows = [(1, 5.0), (2, 5.0), (3, 7.0), (4, 1.0)]
    df = _df(spark, rows)
    got = {
        r["k"]: r["global_rn"]
        for r in global_row_number(df, [F.col("v").desc(), F.col("k").asc()]).collect()
    }
    assert got == {3: 1, 1: 2, 2: 3, 4: 4}


def test_cumsum_matches_model(spark):
    rng = random.Random(23)
    rows = [(i, float(rng.randrange(1, 10))) for i in range(300)]
    df = _df(spark, rows)
    out = ordered_cumsum(df, [F.col("k").asc()], ["v"]).collect()
    got = {r["k"]: r["cum_v"] for r in out}
    run, want = 0.0, {}
    for k, v in sorted(rows):
        run += v
        want[k] = run
    assert got == want


def test_cumsum_multiple_value_columns(spark):
    rows = [(i, float(i), float(i * 2)) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, a double, b double").repartition(6)
    out = ordered_cumsum(df, [F.col("k").asc()], ["a", "b"]).collect()
    for r in out:
        k = r["k"]
        assert r["cum_a"] == k * (k + 1) / 2
        assert r["cum_b"] == k * (k + 1)


def test_no_single_partition_window_over_data(spark):
    # The plan must range-partition the stream; the only no-partition
    # window runs over the per-partition-count aggregate.
    df = _df(spark, [(i, float(i)) for i in range(100)])
    plan = (
        global_row_number(df, [F.col("v").asc()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()


def test_single_partition_input(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 1.0)], "k long, v double").coalesce(1)
    got = {r["k"]: r["global_rn"] for r in global_row_number(df, [F.col("v")]).collect()}
    assert got == {2: 1, 1: 2}


def test_cummin_strict_matches_model(spark):
    rng = random.Random(31)
    rows = [(i, float(rng.randrange(0, 40))) for i in range(300)]
    df = _df(spark, rows)
    out = {
        r["k"]: r["cummin_v"]
        for r in ordered_cummin(df, [F.col("k").asc()], ["v"], strict=True).collect()
    }
    best, want = None, {}
    for k, v in sorted(rows):
        want[k] = best
        best = v if best is None else min(best, v)
    assert out == want


def test_cummin_inclusive(spark):
    rows = [(1, 5.0), (2, 3.0), (3, 9.0)]
    df = _df(spark, rows)
    out = {
        r["k"]: r["cummin_v"]
        for r in ordered_cummin(df, [F.col("k").asc()], ["v"]).collect()
    }
    assert out == {1: 5.0, 2: 3.0, 3: 3.0}


# -- property tests: heavy ties, negatives, arbitrary partition counts --

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PSET = settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
VALS = st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=80)


@given(VALS, st.integers(min_value=1, max_value=7))
@PSET
def test_row_number_property(spark, vals, parts):
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v double").repartition(parts)
    got = {
        r["k"]: r["global_rn"]
        for r in global_row_number(df, [F.col("v").asc(), F.col("k").asc()]).collect()
    }
    want = {
        k: i + 1 for i, (k, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


@given(VALS, st.integers(min_value=1, max_value=7))
@PSET
def test_cumsum_tie_multiset_property(spark, vals, parts):
    # heavy ties: rows within a tie group accumulate in arbitrary order,
    # but the group's cum values form a fixed arithmetic run (prev+v,
    # prev+2v, ..., group_end) either way — so the full (v, cum)
    # MULTISET is deterministic and must match the model exactly
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v double").repartition(parts)
    out = ordered_cumsum(df, [F.col("v").asc()], ["v"]).collect()
    got = sorted((r["v"], r["cum_v"]) for r in out)
    run, want = 0.0, []
    for _, v in sorted(rows, key=lambda t: t[1]):
        run += v
        want.append((v, run))
    assert got == sorted(want)


def test_correct_under_aggressive_aqe_coalescing(spark):
    # AQE may coalesce the range shuffle's partitions when no explicit
    # count is given; coalesced partitions are ADJACENT ranges, so pid
    # order stays range-contiguous and ranks stay exact. Force heavy
    # coalescing (huge advisory size) and verify against the model.
    conf = spark.conf
    before = conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256MB")
    try:
        rows = [(i, float((i * 37) % 101)) for i in range(2000)]
        df = spark.createDataFrame(rows, "k long, v double").repartition(16)
        got = {
            r["k"]: r["global_rn"]
            for r in global_row_number(df, [F.col("v").asc(), F.col("k").asc()]).collect()
        }
        want = {
            k: i + 1
            for i, (k, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
        }
        assert got == want
    finally:
        if before is None:
            conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        else:
            conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", before)


def test_hot_leading_key_splits_across_partitions(spark):
    """Range-partition skew posture under a hot leading key: 90% of
    rows share one value of the leading sort column. Because the FULL
    order tuple (key, tiebreak) is the range key, the RangePartitioner
    splits the tie group on the tiebreaker — the hot key does NOT
    collapse into a single partition, and ranks stay an exact 1..n
    permutation. (A sort key WITHOUT a unique tiebreaker would pin
    all equal keys to one partition — that is the documented contract:
    order_cols should end with a unique tiebreaker.)"""
    n = 20_000
    rows = [(i, 7.0 if i % 10 else float(i % 97)) for i in range(n)]
    df = _df(spark, rows)
    ranked = global_row_number(df, [F.col("v").asc(), F.col("k").asc()], out_col="rn")
    row = ranked.agg(
        F.count_distinct(F.col("rn")).alias("d"),
        F.max(F.col("rn")).alias("m"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert (row["d"], row["m"], row["n"]) == (n, n, n)
    # the hot 90% tie group occupies more than one range partition
    hot_parts = (
        df.repartitionByRange(32, F.col("v").asc(), F.col("k").asc())
        .withColumn("pid", F.spark_partition_id())
        .filter(F.col("v") == 7.0)
        .select("pid")
        .distinct()
        .count()
    )
    assert hot_parts > 1, "hot tie group collapsed into a single range partition"
