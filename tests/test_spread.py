"""plans/spread.py — the scale-adaptive parallelism on-ramp.

Contract under test: below the size cutoff the frame is round-robin
repartitioned to the session's default parallelism (values untouched);
at/above the cutoff the EXACT input frame comes back (no exchange node
added — the 100 TB posture is that the scan's own splits parallelize
the stage).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from usajobs_etl_service_spark.plans.spread import spread_for_compute


def test_small_input_spreads_to_default_parallelism(spark):
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    out = spread_for_compute(df)
    cores = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == cores
    # values are untouched, only placement changes
    assert sorted(r["v"] for r in out.collect()) == [2 * i for i in range(1000)]


def test_small_input_plan_gains_round_robin_exchange(spark):
    # specifically ROUND-ROBIN partitioning (ADVICE r12: any-Exchange
    # would also pass for a hash/range repartition, losing the
    # documented determinism-under-retry posture)
    df = spark.range(0, 100)
    out = spread_for_compute(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "roundrobin" in plan.lower(), plan[:500]


def test_large_estimate_is_structural_noop(spark):
    """Shrinking maxPartitionBytes below estimate/cores flips the
    decision to 'scan already wide enough' — the helper must return
    the very same DataFrame object (no repartition node at all)."""
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
        out = spread_for_compute(df)
        assert out is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
