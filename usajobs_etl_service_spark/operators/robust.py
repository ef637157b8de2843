"""Robust location statistics per group — exact trimmed and
winsorized means (Tukey's robust estimation; the outlier-resistant
summary a metrics pipeline wants when a fat-tailed column would let a
handful of extreme rows move the plain mean).

Exactness contract: the trim CUTOFFS are integer ranks
(``k = floor(trim_frac * n_g)`` rows off each end), decided by the
same distributed ranking as the rest of the rank family — never an
approximate percentile.  The winsorized mean needs no second pass:
clamping the k low rows to the lowest KEPT value and the k high rows
to the highest kept value means
``winsorized_sum = kept_sum + k*min(kept) + k*max(kept)``.

Scale shape: ONE global ranking with the group as the leading range
key (contiguous per group — within-group rank = rn - broadcast
per-group offset, the quantnorm.py trick), then one per-group
aggregate over the kept rows.  No no-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.distributed_order import global_row_number

__all__ = ["trimmed_stats"]


def trimmed_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    trim_frac: float = 0.1,
) -> DataFrame:
    """Per-group trimmed and winsorized means at ``trim_frac``.

    Returns ``(group_col, n, k_trimmed, lo_kept, hi_kept,
    trimmed_mean, winsorized_mean)`` ordered by group — ``k_trimmed``
    rows were dropped off EACH end, ``lo_kept``/``hi_kept`` are the
    winsorization clamp bounds.  NULL groups/values excluded.  Means
    are rounded at 4 (summation order across engines differs at
    ~1e-12 relative on large-magnitude doubles; 4 decimals leaves
    orders of margin).
    """
    if not 0.0 <= trim_frac < 0.5:
        raise ValueError(f"trim_frac must be in [0, 0.5), got {trim_frac}")
    clean = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__v"),
        F.col(id_col).alias("__tb"),
    ).filter(F.col("__g").isNotNull() & F.col("__v").isNotNull())
    ranked = global_row_number(
        clean, [F.col("__g"), F.col("__v"), F.col("__tb")], out_col="__rn"
    )
    offsets = ranked.groupBy("__g").agg(
        (F.min("__rn") - 1).alias("__off"), F.count(F.lit(1)).alias("__n")
    )
    within = (
        ranked.join(F.broadcast(offsets), "__g")
        .withColumn("__grn", F.col("__rn") - F.col("__off"))
        .withColumn("__k", F.floor(F.lit(float(trim_frac)) * F.col("__n")).cast("long"))
    )
    kept = within.filter(
        (F.col("__grn") > F.col("__k")) & (F.col("__grn") <= F.col("__n") - F.col("__k"))
    )
    agg = kept.groupBy("__g").agg(
        F.max("__n").alias("n"),
        F.max("__k").alias("k_trimmed"),
        F.min("__v").alias("lo_kept"),
        F.max("__v").alias("hi_kept"),
        F.sum("__v").alias("__ksum"),
        F.count(F.lit(1)).alias("__kn"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n",
        "k_trimmed",
        "lo_kept",
        "hi_kept",
        F.round(F.col("__ksum") / F.col("__kn"), 4).alias("trimmed_mean"),
        F.round(
            (
                F.col("__ksum")
                + F.col("k_trimmed") * F.col("lo_kept")
                + F.col("k_trimmed") * F.col("hi_kept")
            )
            / F.col("n"),
            4,
        ).alias("winsorized_mean"),
    ).orderBy(group_col)
