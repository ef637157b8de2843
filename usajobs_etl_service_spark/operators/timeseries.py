"""Time-series operators over event streams: fixed-bucket resampling
with gap filling (forward fill), and SCD2 (slowly-changing-dimension
type 2) interval derivation — the warehouse-side building blocks for
per-entity timelines.

Both are single-timeline-per-entity shapes: every window partitions by
the entity key, so at 100 TB the work distributes across entities and
no global sort or driver loop appears anywhere. The gap-fill spine is
bounded by (time range / bucket) rows per entity — for bounded
retention windows (days-months of hourly buckets) this is a small
constant multiple of the entity count, generated executor-side with
``sequence`` + ``explode`` (never a driver range loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_gapfill(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Per-entity fixed-bucket resample: one row per (entity, bucket)
    for EVERY bucket between the entity's first and last event —
    event count per bucket (0 for gaps) and the forward-filled last
    observed value (last event by (ts, tiebreak) at or before the
    bucket's end).

    Shuffle shape: one (entity, bucket) window pass ranks events and
    counts per bucket; the per-entity min/max range is a reuse of that
    output; the dense bucket spine comes from ``sequence`` + ``explode``
    (executor-side, no driver loop); the left join back is an equi-join
    on (entity, bucket); the forward fill is a per-entity running
    ``last(ignorenulls)`` window. Every stage partitions on the entity
    (or entity+bucket) key — nothing global."""
    ent, ts, tb = F.col(entity_col), F.col(ts_col), F.col(tiebreak_col)
    ev = events.select(
        ent.alias("entity"),
        F.date_trunc(bucket, ts).alias("bucket"),
        ts.alias("__ts"),
        tb.alias("__tb"),
        F.col(value_col).alias("__v"),
    )
    w_rank = Window.partitionBy("entity", "bucket").orderBy(
        F.col("__ts").desc(), F.col("__tb").desc()
    )
    w_cnt = Window.partitionBy("entity", "bucket")
    per_bucket = (
        ev.withColumn("__rn", F.row_number().over(w_rank))
        .withColumn("n_events", F.count(F.lit(1)).over(w_cnt))
        .filter(F.col("__rn") == 1)
        .select("entity", "bucket", "n_events", F.col("__v").alias("last_v"))
    )
    spine = (
        per_bucket.groupBy("entity")
        .agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
        .select(
            "entity",
            F.explode(
                F.sequence(F.col("__mn"), F.col("__mx"), F.expr("INTERVAL 1 " + bucket))
            ).alias("bucket"),
        )
    )
    w_fill = Window.partitionBy("entity").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(per_bucket, ["entity", "bucket"], "left")
        .select(
            F.col("entity").alias(entity_col),
            F.col("bucket"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.round(F.last("last_v", ignorenulls=True).over(w_fill), 2).alias("value_ff"),
        )
    )


def scd2_intervals(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """SCD2 history from an event log: collapse each entity's ordered
    attribute observations into change intervals — one row per run of
    equal ``attr_col`` values, valid from the first observation of the
    run until the next change (NULL for the open current interval).

    Two window passes over ONE (entity) hash partition: a lag marks
    change points (the filter preserves partitioning, so the lead pass
    re-sorts without a new Exchange). Deterministic under ts ties via
    the tiebreak column."""
    ent, ts, attr, tb = (
        F.col(entity_col),
        F.col(ts_col),
        F.col(attr_col),
        F.col(tiebreak_col),
    )
    w = Window.partitionBy("entity").orderBy("__ts", "__tb")
    marked = events.select(
        ent.alias("entity"), ts.alias("__ts"), tb.alias("__tb"), attr.alias("attr")
    ).withColumn("__prev", F.lag("attr").over(w))
    changes = marked.filter(
        F.col("__prev").isNull() | (F.col("attr") != F.col("__prev"))
    )
    return changes.select(
        F.col("entity").alias(entity_col),
        F.col("attr").alias(attr_col),
        F.col("__ts").alias("valid_from"),
        F.lead("__ts").over(w).alias("valid_to"),
    )


def acf(
    series: DataFrame,
    *,
    order_col: str,
    value_col: str,
    max_lag: int = 14,
) -> DataFrame:
    """Sample autocorrelation function of an ordered series:
    ``(lag, n_pairs, acf)`` for lags 1..``max_lag``, the standard
    estimator (Box & Jenkins) with the global mean and the full-series
    variance in the denominator:

        r(l) = sum_t (y_t - m)(y_{t+l} - m) / sum_t (y_t - m)^2

    Scale posture: ``series`` must already be AGGREGATED to its grain
    (e.g. one row per day) — its length is bounded by the calendar, not
    the data volume, so the single ordered window over it is sound at
    any corpus size (the same boundedness argument as q138's trend
    fit; for entity-parallel ACF, groupBy the entity and apply this
    per group). All ``max_lag`` lead columns come from ONE window pass;
    the products reduce in one aggregate; lags unpivot via ``stack``.
    Ties in ``order_col`` would make lead() nondeterministic — the
    series grain must make it unique (one row per period).
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    w = Window.orderBy(order_col)
    m = series.agg(F.avg(F.col(value_col).cast("double")).alias("__m"))
    y = F.col(value_col).cast("double")
    with_leads = series.crossJoin(F.broadcast(m)).select(
        (y - F.col("__m")).alias("d0"),
        *[
            (F.lead(y, lag).over(w) - F.col("__m")).alias(f"d{lag}")
            for lag in range(1, max_lag + 1)
        ],
    )
    aggs = [F.sum(F.col("d0") * F.col("d0")).alias("ssq")]
    for lag in range(1, max_lag + 1):
        aggs.append(F.sum(F.col("d0") * F.col(f"d{lag}")).alias(f"num{lag}"))
        aggs.append(F.count(F.col(f"d{lag}")).alias(f"n{lag}"))
    red = with_leads.agg(*aggs)
    stack_args = ", ".join(
        f"{lag}, n{lag}, num{lag} / ssq" for lag in range(1, max_lag + 1)
    )
    return red.selectExpr(
        f"stack({max_lag}, {stack_args}) AS (lag, n_pairs, acf)"
    )


def robust_trend(
    series: DataFrame,
    *,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Theil-Sen robust trend + Mann-Kendall trend test over an ordered
    series, in one pass over the pairwise grid:

    - ``slope``: median of all pairwise slopes (y_j - y_i)/(x_j - x_i),
      i < j (Theil 1950 / Sen 1968) — up to 29% contamination does not
      move it, where one bad day drags an OLS fit (q138) arbitrarily.
    - ``intercept``: median of (y_i - slope * x_i) over the points.
    - ``mk_s``: the Mann-Kendall statistic sum(sign(y_j - y_i)) —
      an INTEGER sum, exact in any engine and summation order.
    - ``mk_z``: the normal-approximation z under the no-tie variance
      n(n-1)(2n+5)/18 (ties in y are counted by sign() as zero
      contributions; the plain variance is the documented contract).

    Scale posture: the pairwise grid is O(d^2) of the AGGREGATED
    series — the acf() boundedness argument (d is calendar days, not
    rows), so a self-join on the bounded series is sound at any corpus
    size (2400 days -> ~3M pairs). ``order_col`` must be castable to
    double x-coordinates via days-since-epoch when a date, else cast
    directly. Output: one row (n, slope, intercept, mk_s, mk_z).
    """
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    temporal = isinstance(
        series.schema[order_col].dataType,
        (DateType, TimestampType, TimestampNTZType),
    )
    # temporal orders become whole days-since-epoch (a DAILY series is
    # the operator's grain contract — intraday components truncate)
    xexpr = (
        F.datediff(F.to_date(F.col(order_col)), F.lit("1970-01-01"))
        if temporal
        else F.col(order_col)
    ).cast("double")
    from pyspark.storagelevel import StorageLevel

    from usajobs_etl_service_spark.operators.distributed_order import (
        distributed_median,
    )

    pts = series.select(
        xexpr.alias("x"), F.col(value_col).cast("double").alias("y")
    )
    a = pts.select(F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = pts.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    # persisted: the grid feeds BOTH the slope median and the MK sum —
    # unpersisted, the O(d^2) nested-loop join would run twice
    pairs = (
        a.join(b, F.col("xi") < F.col("xj"))
        .withColumn(
            "slope_ij", (F.col("yj") - F.col("yi")) / (F.col("xj") - F.col("xi"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        # exact interpolated median WITHOUT the single-reducer
        # F.percentile buffer (measured 9.3 s -> ~1.5 s on a 2.9M-pair
        # grid — distributed_order.distributed_median)
        slope = distributed_median(pairs, "slope_ij")
        if slope is None:
            raise ValueError("robust_trend needs at least 2 distinct x points")
        mk = pairs.agg(
            F.sum(F.signum(F.col("yj") - F.col("yi")).cast("long")).alias("mk_s")
        ).first()
    finally:
        pairs.unpersist()
    mk_s = int(mk["mk_s"])
    return pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.lit(slope).alias("slope"),
        F.percentile(F.col("y") - F.lit(slope) * F.col("x"), F.lit(0.5)).alias(
            "intercept"
        ),
        F.lit(mk_s).alias("mk_s"),
        (
            F.lit(mk_s)
            / F.sqrt(
                F.count(F.lit(1))
                * (F.count(F.lit(1)) - 1)
                * (2 * F.count(F.lit(1)) + 5)
                / F.lit(18.0)
            )
        ).alias("mk_z"),
    )
