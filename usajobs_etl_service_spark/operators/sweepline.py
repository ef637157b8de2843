"""Sweep-line interval concurrency (extension operator, q117).

Reference capability: the reference's monitoring surface reports flat
counts over time buckets (/root/reference/etl/etl.py:563-607); "how many
sessions were open at once" is the canonical next question over any
interval table (sessions, jobs, connections) and cannot be answered by
bucket counts alone.

Semantics: closed intervals — a session ending at the exact instant
another starts counts as overlapping. Each interval emits a +1 event at
``start`` and a -1 event at ``end``; the running sum ordered by
``(ts ASC, delta DESC)`` (starts before ends at a tie) is the number of
concurrently-open intervals at each boundary instant.

Scale shape: a single global running sum is a one-partition window — the
classic sweep-line scale trap. Instead the running sum is split into a
per-bucket (calendar-day) windowed cumulative sum plus a carry-in offset
per bucket, where the offsets come from a cumulative sum over the tiny
per-bucket-net-delta aggregate (one row per day — thousands of rows for
a decade, broadcastable; the only single-partition window runs over that
aggregate, never over the event stream). Buckets are contiguous in time,
so carry-in(b) + local running sum == the global running sum exactly.
Ties never straddle a bucket boundary (different buckets => different
timestamps), so the split is order-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_concurrency(
    intervals: DataFrame,
    *,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Boundary events + running ``concurrency`` for closed intervals.

    Returns one row per interval endpoint with columns ``bucket``
    (calendar day), ``ts``, ``delta`` (+1 start / -1 end) and
    ``concurrency`` (open-interval count immediately after processing
    this endpoint). Downstream aggregates (daily peak, global peak)
    reduce this without another shuffle on the event stream.
    """
    # fail loud on open intervals: a NULL endpoint would land in a NULL
    # bucket that sorts FIRST in the carry-in window and silently skew
    # every real bucket's offset. Close open intervals upstream (e.g.
    # coalesce(end_ts, observation_time)) before sweeping. The guard
    # lives INSIDE the emitted ts column so column pruning can't
    # eliminate it.
    def _checked(col: str):
        return F.when(
            F.col(col).isNull(),
            F.raise_error(
                F.lit(
                    f"interval_concurrency: NULL {col} — close open intervals before sweeping"
                )
            ).cast(intervals.schema[col].dataType),
        ).otherwise(F.col(col))

    starts = intervals.select(_checked(start_col).alias("ts"), F.lit(1).alias("delta"))
    ends = intervals.select(_checked(end_col).alias("ts"), F.lit(-1).alias("delta"))
    deltas = starts.unionByName(ends).withColumn("bucket", F.to_date("ts"))

    # Carry-in per bucket: cumulative net delta of all PRIOR buckets.
    # One row per day — the single-partition window is over this tiny
    # aggregate only, and the result broadcasts back onto the stream.
    per_bucket = deltas.groupBy("bucket").agg(F.sum("delta").alias("net"))
    w_prior = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("net").over(w_prior), F.lit(0)).alias("carry_in"),
    )

    # Within-bucket running sum: starts sort before ends at a timestamp
    # tie (delta DESC) => closed-interval overlap semantics.
    w_local = Window.partitionBy("bucket").orderBy(
        F.col("ts").asc(), F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    run = deltas.withColumn("local_run", F.sum("delta").over(w_local))
    return run.join(F.broadcast(offsets), "bucket").withColumn(
        "concurrency", (F.col("local_run") + F.col("carry_in")).cast("int")
    )


def daily_peak_concurrency(
    intervals: DataFrame,
    *,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Per-day peak of the concurrency sweep: ``(bucket, peak, n_starts)``.

    The daily max of the running sum is deterministic even though tied
    ``(ts, delta)`` rows order arbitrarily: within a tie group of equal
    deltas the running values form a fixed arithmetic run whose maximum
    does not depend on which identical row got which value.
    """
    sweep = interval_concurrency(intervals, start_col=start_col, end_col=end_col)
    return sweep.groupBy("bucket").agg(
        F.max("concurrency").alias("peak"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_starts"),
    )
