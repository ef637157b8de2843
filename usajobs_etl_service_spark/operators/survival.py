"""Kaplan-Meier survival estimation (Kaplan & Meier 1958) over an
event stream — the product-limit estimate of user lifetime with
right-censoring, the standard retention/churn analysis a warehouse
runs over exactly the reference's job-posting event shape.

Censoring model (day-granular, so the TIMESTAMP_NS seam between
engines never matters): a subject's lifetime is ``date(last event) -
date(first event)`` in days; subjects last seen within
``churn_horizon_days`` of the stream's end are CENSORED at that
lifetime (still alive for all we know), everyone else is an observed
churn event.  Both deaths and censorings at time t sit in the risk set
at t (the standard convention).

Scale shape: ONE subject-key aggregate over the stream (the only data
shuffle — first/last per subject), a global (max date, n subjects)
1-row broadcast, then the life table — one row per DISTINCT lifetime,
bounded by the calendar span of the stream, hundreds of rows at any
data scale — carries every window.  The no-partition windows here run
over that bounded life table, never over the event stream (the
distributed_order.py offsets-fold argument).

Numerical contract: the survival product is
``exp(sum(ln((n_t - d_t) / n_t)))`` accumulated in lifetime order —
both engines fold the same correctly-rounded doubles in the same
order, and the result is rounded at 6 (the q218 ln/exp precedent).  A
time where every remaining subject dies (d == n) would put ln(0) in
the sum; those rows and everything after are forced to exactly 0.0 by
a cumulative flag instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["km_curve"]


def km_curve(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    *,
    churn_horizon_days: int = 14,
) -> DataFrame:
    """Kaplan-Meier life table + survival curve.

    Returns one row per lifetime (in days) at which >= 1 churn was
    observed: ``(duration_days, n_at_risk, n_events, n_censored,
    survival)``, ordered by lifetime.  ``n_censored`` counts subjects
    censored at exactly that lifetime (informational; censorings at
    other lifetimes still shrink later risk sets).  NULL ids or
    timestamps are excluded.
    """
    if churn_horizon_days < 0:
        raise ValueError(
            f"churn_horizon_days must be >= 0, got {churn_horizon_days}"
        )
    base = df.select(F.col(id_col).alias("__id"), F.col(ts_col).alias("__ts")).filter(
        F.col("__id").isNotNull() & F.col("__ts").isNotNull()
    )
    per = base.groupBy("__id").agg(
        F.to_date(F.min("__ts")).alias("__first"),
        F.to_date(F.max("__ts")).alias("__last"),
    )
    totals = base.agg(
        F.to_date(F.max("__ts")).alias("__end"),
        F.count_distinct("__id").alias("__n"),
    )
    flagged = per.crossJoin(F.broadcast(totals)).select(
        F.datediff("__last", "__first").alias("duration_days"),
        (
            F.col("__last") < F.date_sub(F.col("__end"), churn_horizon_days)
        )
        .cast("int")
        .alias("__churned"),
        "__n",
    )
    life = flagged.groupBy("duration_days").agg(
        F.count(F.lit(1)).alias("__t"),
        F.sum("__churned").alias("n_events"),
        F.max("__n").alias("__n"),
    )
    # bounded life table from here on: one row per distinct lifetime
    w_prior = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_upto = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = F.col("__n") - F.coalesce(F.sum("__t").over(w_prior), F.lit(0))
    curve = (
        life.withColumn("n_at_risk", at_risk)
        .withColumn(
            "__ln",
            F.when(
                F.col("n_events") < F.col("n_at_risk"),
                F.log(
                    (F.col("n_at_risk") - F.col("n_events")) / F.col("n_at_risk")
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "__dead",
            F.max((F.col("n_events") >= F.col("n_at_risk")).cast("int")).over(w_upto),
        )
        .withColumn("__cum", F.sum("__ln").over(w_upto))
        .withColumn(
            "survival",
            F.when(F.col("__dead") == 1, F.lit(0.0)).otherwise(
                F.round(F.exp("__cum"), 6)
            ),
        )
    )
    return (
        curve.filter(F.col("n_events") > 0)
        .select(
            "duration_days",
            "n_at_risk",
            "n_events",
            (F.col("__t") - F.col("n_events")).alias("n_censored"),
            "survival",
        )
        .orderBy("duration_days")
    )
