"""Distributed global ordering primitives (q28 internals, q122, q123).

``Window.orderBy(...)`` with no partition key moves EVERY row to one
partition — the classic Spark scale trap (WindowExec even warns). These
primitives compute exact global row numbers and exact ordered running
sums with no single-partition stage over the data:

1. ``repartitionByRange`` on the order key gives contiguous, sorted,
   *parallel* ranges (Spark's RangePartitioner sends equal keys to the
   same partition and assigns ranges to partition ids in ascending
   order);
2. a per-partition window (partitioned by ``spark_partition_id()``)
   computes the local row number / running sum;
3. the global offset of each partition comes from a cumulative sum over
   the per-partition COUNT/SUM aggregate — one row per partition
   (thousands of rows at worst), the only single-partition window in
   the plan — broadcast back onto the stream.

global = local + carry-in(partition), exactly, because ranges are
key-contiguous. Cost: one range exchange + one hash exchange on the
partition id (the window re-shuffle; balanced, parallel) — vs the
single-reducer sort it replaces.

The same split powers the sweep-line operator (sweepline.py), which
buckets by calendar day instead of sampled ranges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__do_pid"


def _ranged(df: DataFrame, order_cols: Sequence[Column | str]) -> DataFrame:
    return df.repartitionByRange(*order_cols).withColumn(_PID, F.spark_partition_id())


def _carry_in(parts: DataFrame, agg_col: Column, alias: str) -> DataFrame:
    """Per-partition cumulative offset: one row per partition id."""
    per_part = parts.groupBy(_PID).agg(agg_col.alias("_net"))
    w_prior = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    return per_part.select(
        _PID, F.coalesce(F.sum("_net").over(w_prior), F.lit(0)).alias(alias)
    )


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    *,
    out_col: str = "global_rn",
) -> DataFrame:
    """Exact 1-based global row number in ``order_cols`` order.

    ``order_cols`` should end with a unique tiebreaker for a
    deterministic numbering (ties are co-located either way, so any
    aggregate that is tie-order-invariant — Gini's sum(rank*x) over
    equal x, top-k boundaries — is exact regardless).
    """
    parts = _ranged(df, order_cols)
    offsets = _carry_in(parts, F.count(F.lit(1)), "_offset")
    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        parts.withColumn("_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col("_local") + F.col("_offset")).cast("long"))
        .drop(_PID, "_local", "_offset")
    )


def ordered_cumsum(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    value_cols: Sequence[str],
    *,
    prefix: str = "cum_",
) -> DataFrame:
    """Exact running sum of each ``value_cols`` in global ``order_cols``
    order (ROWS UNBOUNDED PRECEDING..CURRENT). Rows tied on the full
    ``order_cols`` accumulate in arbitrary order within the tie group —
    totals after the group are exact; include a tiebreaker when
    intermediate values matter."""
    parts = _ranged(df, order_cols)
    # one carry-in per value column, off one shared per-partition groupBy
    per_part = parts.groupBy(_PID).agg(
        *[F.sum(v).alias(f"_net_{v}") for v in value_cols]
    )
    w_prior = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_part.select(
        _PID,
        *[
            F.coalesce(F.sum(f"_net_{v}").over(w_prior), F.lit(0)).alias(f"_off_{v}")
            for v in value_cols
        ],
    )
    w_local = Window.partitionBy(_PID).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = parts
    for v in value_cols:
        out = out.withColumn(f"_loc_{v}", F.sum(v).over(w_local))
    out = out.join(F.broadcast(offsets), _PID)
    for v in value_cols:
        out = out.withColumn(f"{prefix}{v}", F.col(f"_loc_{v}") + F.col(f"_off_{v}")).drop(
            f"_loc_{v}", f"_off_{v}"
        )
    return out.drop(_PID)


def ordered_cummin(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    value_cols: Sequence[str],
    *,
    strict: bool = False,
    prefix: str = "cummin_",
) -> DataFrame:
    """Exact running minimum of each ``value_cols`` in global
    ``order_cols`` order, same split as ``ordered_cumsum``.

    ``strict=True`` takes the min over STRICTLY preceding rows only
    (first global row gets NULL) — the form dominance/skyline tests
    need. The carry-in min from earlier partitions composes with
    ``F.least``, which skips NULLs.
    """
    upper = -1 if strict else 0
    parts = _ranged(df, order_cols)
    per_part = parts.groupBy(_PID).agg(
        *[F.min(v).alias(f"_net_{v}") for v in value_cols]
    )
    w_prior = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_part.select(
        _PID,
        *[F.min(f"_net_{v}").over(w_prior).alias(f"_off_{v}") for v in value_cols],
    )
    w_local = Window.partitionBy(_PID).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, upper
    )
    out = parts
    for v in value_cols:
        out = out.withColumn(f"_loc_{v}", F.min(v).over(w_local))
    out = out.join(F.broadcast(offsets), _PID)
    for v in value_cols:
        out = out.withColumn(
            f"{prefix}{v}", F.least(F.col(f"_loc_{v}"), F.col(f"_off_{v}"))
        ).drop(f"_loc_{v}", f"_off_{v}")
    return out.drop(_PID)
