"""Binned range join: points-in-intervals without the cross join.

Spark plans a plain ``p BETWEEN start AND end`` join as
BroadcastNestedLoopJoin (or worse, a cartesian product) — O(|points| x
|intervals|). The scale-safe form bins the domain: every interval
explodes to the buckets it overlaps, every point lands in exactly one
bucket, and the join becomes a hash equi-join on bucket followed by the
exact range filter. Cost: O(|points| + |intervals| x avg_buckets +
matches) — linear, shuffled once on the bucket key.

``bin_size`` tunes the explode factor vs bucket selectivity: pick it
near the median interval length so most intervals hit 1-2 buckets.
Works over any numeric domain; for timestamps pass epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_size: int,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` x ``intervals`` where ``start <= point < end``
    (half-open, the usual temporal-window convention). Column names must
    not collide between the two frames (rename first if they do)."""
    if bin_size <= 0:
        raise ValueError("bin_size must be positive")
    if how != "inner":
        raise ValueError("only inner point-in-interval joins are supported")
    p_bucket = F.floor(F.col(point_col) / bin_size)
    # interval [s, e) overlaps buckets floor(s/B) .. floor((e-1)/B); an
    # empty interval (e <= s) overlaps none
    lo = F.floor(F.col(start_col) / bin_size)
    hi = F.floor((F.col(end_col) - 1) / bin_size)
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket", F.explode(F.sequence(lo, hi))
    )
    pt = points.withColumn("__bucket", p_bucket)
    joined = pt.join(iv, "__bucket").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bucket")
