"""Bucketed-table layout (sinks/bucketed.py): write-once pre-shuffle,
then joins and aggregations on the bucket key plan with ZERO Exchange."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.session import read_table
from usajobs_etl_service_spark.sinks.bucketed import (
    assert_no_exchange_on,
    bucketize_write,
    bucketized_table,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("buckets")
    orders = read_table(spark, SF, "orders")
    li = read_table(spark, SF, "lineitem")
    bucketize_write(orders, "t_b_orders", "o_orderkey", 8, str(d / "o"))
    bucketize_write(li, "t_b_lineitem", "l_orderkey", 8, str(d / "l"))
    yield (
        bucketized_table(spark, "t_b_orders"),
        bucketized_table(spark, "t_b_lineitem"),
        orders,
        li,
    )
    spark.sql("DROP TABLE IF EXISTS t_b_orders")
    spark.sql("DROP TABLE IF EXISTS t_b_lineitem")


def test_roundtrip_rows_and_file_count(spark, bucketed_pair, tmp_path):
    bo, _, orders, _ = bucketed_pair
    assert bo.count() == orders.count()
    # one file per bucket: the repartition-before-write keeps the file
    # count at n_buckets, not n_tasks * n_buckets
    path = str(tmp_path / "o2")
    bucketize_write(orders, "t_b_orders2", "o_orderkey", 4, path)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 4, files
    spark.sql("DROP TABLE IF EXISTS t_b_orders2")


def test_join_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    bo, bl, orders, li = bucketed_pair
    j = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey)
    plan = _plan(j)
    assert "SortMergeJoin" in plan, plan[:900]
    assert "Exchange" not in plan, plan[:900]
    assert "Bucketed: true" in plan, plan[:900]
    assert_no_exchange_on(j)  # helper agrees
    # values identical to the plain (shuffled) join
    got = j.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * F.col("o_totalprice")), 2).alias("chk"),
    ).first()
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * F.col("o_totalprice")), 2).alias("chk"),
        )
        .first()
    )
    assert (got["n"], got["chk"]) == (want["n"], want["chk"])


def test_groupby_bucket_key_has_no_exchange(spark, bucketed_pair):
    bo, _, orders, _ = bucketed_pair
    g = bo.groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    assert "Exchange" not in _plan(g), _plan(g)[:900]
    assert g.count() == orders.select("o_orderkey").distinct().count()


def test_full_pipeline_join_agg_topk_shuffle_free(spark, bucketed_pair):
    """The q195 shape: SMJ on the bucket key -> HashAggregate on the
    SAME key -> TakeOrdered. Zero Exchange end-to-end."""
    bo, bl, _, _ = bucketed_pair
    out = (
        bl.hint("merge")
        .join(bo, bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        .orderBy(F.desc("rev"), "o_orderkey")
        .limit(10)
    )
    plan = _plan(out)
    assert "Exchange" not in plan, plan[:1200]
    assert "TakeOrderedAndProject" in plan, plan[:1200]
    assert out.count() == 10


def test_mismatched_bucket_counts_coalesce(spark, bucketed_pair, tmp_path):
    """8-bucket fact vs 4-bucket dim: with bucket coalescing on, the
    join still plans without a shuffle (8 is a multiple of 4)."""
    bo, bl, orders, _ = bucketed_pair
    bucketize_write(orders, "t_b_orders4", "o_orderkey", 4, str(tmp_path / "o4"))
    bo4 = bucketized_table(spark, "t_b_orders4")
    key = "spark.sql.bucketing.coalesceBucketsInJoin.enabled"
    old = spark.conf.get(key, "false")
    try:
        spark.conf.set(key, "true")
        j = bl.hint("merge").join(bo4, bl.l_orderkey == bo4.o_orderkey)
        plan = _plan(j)
        assert "Exchange" not in plan, plan[:900]
    finally:
        spark.conf.set(key, old)
        spark.sql("DROP TABLE IF EXISTS t_b_orders4")


def test_validation_errors(spark, bucketed_pair, tmp_path):
    _, _, orders, _ = bucketed_pair
    with pytest.raises(ValueError, match="not in"):
        bucketize_write(orders, "t_bad", "nope", 4, str(tmp_path / "x"))
    with pytest.raises(ValueError, match=">= 1"):
        bucketize_write(orders, "t_bad", "o_orderkey", 0, str(tmp_path / "x"))
