"""Aggregation operators A1-A5, A7-A9 (SURVEY.md §2.4).

The reference's ``job_statistics`` view (``init.sql:60-70``) and
``get_statistics()`` (``etl/etl.py:527-547``) are a single scalar
multi-aggregate: COUNT(*), COUNT(DISTINCT ..), three conditional
date-window counts, MAX/MIN. In Spark this is ONE ``df.agg(...)`` pass —
Catalyst plans partial (map-side) + final aggregation automatically, so
at 100 TB the full-table pass is one scan + one tiny all-to-one exchange
of partial states (no row shuffle).

``anchor_date``: the reference uses ``CURRENT_DATE``; tests and the
DuckDB oracle need determinism, so the anchor is injectable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_if(cond: Column) -> Column:
    """A3: ``COUNT(*) FILTER (WHERE cond)`` (reference init.sql:65-67)."""
    return F.count(F.when(cond, F.lit(1)))


def summary_stats(
    df: DataFrame,
    *,
    org_col: str,
    dept_col: str,
    ts_col: str,
    anchor_date: Column | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """A5: the ``job_statistics`` scalar multi-aggregate in one pass.

    Output columns mirror the view (reference init.sql:60-70):
    total_jobs, unique_organizations, unique_departments, jobs_today,
    jobs_this_week, jobs_this_month, last_job_date, first_job_date.

    ``approx_distinct=True`` swaps exact COUNT(DISTINCT) for HLL
    ``approx_count_distinct`` — at 100 TB two exact distincts in one
    query force an expand+double-shuffle; HLL keeps it a single pass.
    """
    anchor = anchor_date if anchor_date is not None else F.current_date()
    ts = F.col(ts_col)
    distinct = F.approx_count_distinct if approx_distinct else F.countDistinct
    return df.agg(
        F.count(F.lit(1)).alias("total_jobs"),  # A1
        distinct(org_col).alias("unique_organizations"),  # A2
        distinct(dept_col).alias("unique_departments"),  # A2
        count_if(F.to_date(ts) >= anchor).alias("jobs_today"),  # A3
        count_if(F.to_date(ts) >= F.date_sub(anchor, 7)).alias("jobs_this_week"),  # A3/F8
        count_if(F.to_date(ts) >= F.date_sub(anchor, 30)).alias("jobs_this_month"),  # A3/F8
        F.max(ts).alias("last_job_date"),  # A4
        F.min(ts).alias("first_job_date"),  # A4
    )


def group_counts(df: DataFrame, group_col: str) -> DataFrame:
    """A7: ``SELECT g, COUNT(*) ... GROUP BY g ORDER BY count DESC``
    (reference test_performance.py:377). Hash aggregate with map-side
    partial combine — shuffle carries one row per (partition, group)."""
    return df.groupBy(group_col).agg(F.count(F.lit(1)).alias("job_count"))


def salted_group_counts(
    df: DataFrame, group_col: str, *, salt_buckets: int = 32, salt_threshold: int | None = None
) -> DataFrame:
    """A7 under key skew: two-phase (salted) aggregation.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers instead of melting one; phase 2 merges the
    per-salt partials (tiny: |keys| * salt_buckets rows). Same result as
    ``group_counts``, different shuffle shape. Use when one key holds
    >~1% of a 100 TB table; for joins AQE's skew handling does this
    automatically, but aggregations need it done by hand."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)))
    partial = salted.groupBy(group_col, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(group_col).agg(F.sum("__partial").cast("long").alias("job_count"))


def metric_value_union(df: DataFrame, metrics: list[tuple[str, Column]]) -> DataFrame:
    """U1: the monitor.sh UNION ALL shape (reference monitor.sh:19-39) —
    labelled scalar aggregates as (metric, value) text rows. Computed as
    ONE aggregate pass + unpivot (stack), not N scans: at scale, four
    separate scans of a 100 TB table for four scalars is the bug."""
    agg = df.agg(*[expr.cast("string").alias(name) for name, expr in metrics])
    stack_args: list[Column] = []
    for name, _ in metrics:
        stack_args.append(F.lit(name))
        stack_args.append(F.col(name))
    return agg.select(
        F.stack(F.lit(len(metrics)), *stack_args).alias("metric", "value")
    )


def sketch_distinct_by_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group distinct-count SKETCHES plus their union — the
    mergeable-partial shape for distinct counting at 100 TB: each
    group (partition, day, shard) aggregates its own DataSketches HLL
    sketch in one pass; any rollup level is then a register-wise
    ``hll_union_agg`` over the stored sketches, never a re-scan of the
    raw data. (``approx_count_distinct`` in stats A2/q35 merges
    internally too, but its partials are query-scoped; sketch columns
    are a *storable* artifact — the difference between "can aggregate
    once" and "can maintain a distinct-count rollup incrementally".)

    Returns one row per group plus an 'ALL' row whose estimate comes
    from unioning the per-group sketches (NOT from re-aggregating the
    raw column). Estimates are exact while the sketch is in its
    small-cardinality exact mode — the oracle-checkable regime (q97);
    at production cardinalities the same plan yields the documented
    ~1.6%% rsd estimate."""
    per = df.groupBy(group_col).agg(F.hll_sketch_agg(value_col).alias("sk"))
    est = per.select(
        F.col(group_col).cast("string").alias("grp"),
        F.hll_sketch_estimate("sk").alias("n_distinct"),
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_distinct")
    ).select(F.lit("ALL").alias("grp"), "n_distinct")
    return est.unionByName(merged)
