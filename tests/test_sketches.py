"""Sketch accuracy bounds: approx quantiles (GK) vs exact, mirroring
the HLL error test for q35."""

from __future__ import annotations

from pyspark.sql import functions as F

from usajobs_etl_service_spark.session import read_table


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    approx = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 1000).alias("p50a"),
            F.percentile_approx("value", 0.95, 1000).alias("p95a"),
        )
        .collect()
    }
    # GK guarantees rank error <= n/accuracy; translate to a loose value
    # tolerance via the observed spread
    for et, ex in exact.items():
        spread = abs(ex["p95"] - ex["p50"]) + 1e-9
        ap = approx[et]
        assert abs(ap["p50a"] - ex["p50"]) <= 0.2 * spread, (et, ap["p50a"], ex["p50"])
        assert abs(ap["p95a"] - ex["p95"]) <= 0.2 * spread, (et, ap["p95a"], ex["p95"])


def test_approx_quantiles_single_aggregation_pass(spark, sf_dir):
    """The point of the sketch: one partial+final aggregate, no sort of
    the group's rows (q49's exact percentiles sort each group)."""
    import __spark_entry__ as e

    p = e.q79_approx_quantiles(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in p or "HashAggregate" in p or "SortAggregate" in p
    assert p.count("Exchange") <= 2  # one data shuffle (plus AQE reads)
