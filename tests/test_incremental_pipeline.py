"""End-to-end incremental warehouse pattern: dynamic-partition writes
(sinks/partitioned.py) feeding merged partial aggregates
(operators/ivm.py). Proves the composition a 100 TB deployment runs:
land each day's slice, maintain the rollup from partials, re-land a
corrected day idempotently, and the maintained rollup still equals the
full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.ivm import merge_aggregates, partial_aggregate
from usajobs_etl_service_spark.sinks.partitioned import (
    overwrite_partitions,
    read_partitioned,
)

SPEC = {"n": "count:", "s": "sum:v"}


def _day(spark, day, rows):
    return spark.createDataFrame(
        [(day, k, float(v)) for k, v in rows], "day string, k string, v double"
    )


def _rollup(df):
    return {r["k"]: (r["n"], r["s"]) for r in df.collect()}


def test_land_maintain_backfill_cycle(spark, tmp_path):
    path = str(tmp_path / "facts")

    # day 1 and day 2 land as partitions
    d1 = _day(spark, "d1", [("x", 1), ("x", 2), ("y", 10)])
    d2 = _day(spark, "d2", [("x", 4), ("z", 7)])
    overwrite_partitions(d1, path, partition_cols=["day"])
    overwrite_partitions(d2, path, partition_cols=["day"])

    # rollup maintained from per-day partials (never re-scanning history)
    p1 = partial_aggregate(d1, ["k"], SPEC)
    p2 = partial_aggregate(d2, ["k"], SPEC)
    maintained = merge_aggregates([p1, p2], ["k"], SPEC)
    full = partial_aggregate(read_partitioned(spark, path), ["k"], SPEC)
    assert _rollup(maintained) == _rollup(full)

    # day 1 is corrected and re-landed; only its partition changes
    d1_fix = _day(spark, "d1", [("x", 100), ("y", 10)])
    overwrite_partitions(d1_fix, path, partition_cols=["day"])
    p1_fix = partial_aggregate(d1_fix, ["k"], SPEC)
    maintained = merge_aggregates([p1_fix, p2], ["k"], SPEC)
    full = partial_aggregate(read_partitioned(spark, path), ["k"], SPEC)
    assert _rollup(maintained) == _rollup(full)
    assert _rollup(maintained) == {"x": (2, 104.0), "y": (1, 10.0), "z": (1, 7.0)}


def test_partial_recompute_from_landed_partition(spark, tmp_path):
    # the partial can be rebuilt from the LANDED partition (filter
    # prunes to that partition's files), not the in-memory batch
    path = str(tmp_path / "facts")
    overwrite_partitions(
        _day(spark, "d1", [("x", 1)]), path, partition_cols=["day"]
    )
    overwrite_partitions(
        _day(spark, "d2", [("x", 2), ("y", 3)]), path, partition_cols=["day"]
    )
    p_d2 = partial_aggregate(
        read_partitioned(spark, path).filter(F.col("day") == "d2"), ["k"], SPEC
    )
    assert _rollup(p_d2) == {"x": (1, 2.0), "y": (1, 3.0)}
