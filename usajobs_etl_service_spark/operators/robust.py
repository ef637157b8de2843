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

from usajobs_etl_service_spark.operators.distributed_order import grouped_row_number

__all__ = ["trimmed_stats", "grouped_median_mad", "grouped_quantiles"]


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
    # double cast matches the sibling rank functions: a DECIMAL input
    # would make Spark divide exact-decimal with HALF_UP while an
    # oracle's decimal->double division rounds half-even — a sum of
    # 2-decimal values over an integer count lands on x.xxxx5 routinely,
    # so the contract is double arithmetic in BOTH engines
    clean = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(id_col).alias("__tb"),
    ).filter(F.col("__g").isNotNull() & F.col("__v").isNotNull())
    within = grouped_row_number(
        clean, "__g", [F.col("__v"), F.col("__tb")], out_col="__grn", n_col="__n"
    ).withColumn("__k", F.floor(F.lit(float(trim_frac)) * F.col("__n")).cast("long"))
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


def _grouped_median(
    clean: DataFrame, value: str, group: str, tiebreak: str, out: str
) -> DataFrame:
    """Exact interpolated per-group median (quantile_cont(0.5)
    semantics) WITHOUT per-group value buffers: ``F.percentile``
    collects every group's values into one task's buffer — fine for
    many small groups, a melted reducer for one mega-group.  Here the
    group-leading global ranking locates the (at most two) middle
    order statistics per group and averages them: scales with the
    ranking, not the largest group (the distributed_order.
    distributed_median argument, per group)."""
    mids = grouped_row_number(
        clean, group, [F.col(value), F.col(tiebreak)], out_col="__grn", n_col="__n"
    ).filter(
        # integer-div middle ranks: odd n -> (n+1) div 2 == n div 2 + 1
        # (one row); even n -> n div 2 and n div 2 + 1 (two rows)
        (F.col("__grn") == F.expr("(__n + 1) div 2"))
        | (F.col("__grn") == F.expr("__n div 2 + 1"))
    )
    return mids.groupBy(group).agg(F.avg(F.col(value)).alias(out))


def grouped_median_mad(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    z_cutoff: float = 3.5,
) -> DataFrame:
    """Per-group exact median, MAD, and the Iglewicz-Hoaglin modified
    z-score outlier count (|0.6745 * (x - median) / MAD| > z_cutoff —
    the robust replacement for mean/stddev z-scores, immune to the
    outliers it hunts).  Two group-leading rank passes (value, then
    absolute deviation), each one range exchange; medians travel as a
    |groups|-row broadcast.  A zero MAD (majority-constant group)
    yields a NULL modified z for every row via ``try_divide`` — no
    outliers counted, identically in both engines.  Returns
    ``(group_col, n, median, mad, n_outliers)`` ordered by group."""
    clean = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(id_col).alias("__tb"),
    ).filter(F.col("__g").isNotNull() & F.col("__v").isNotNull())
    med = _grouped_median(clean, "__v", "__g", "__tb", "median")
    devs = clean.join(F.broadcast(med), "__g").withColumn(
        "__dev", F.abs(F.col("__v") - F.col("median"))
    )
    mad = _grouped_median(
        devs.select("__g", "__dev", "__tb"), "__dev", "__g", "__tb", "mad"
    )
    scored = devs.join(F.broadcast(mad), "__g").withColumn(
        "__mz", F.try_divide(F.lit(0.6745) * F.col("__dev"), F.col("mad"))
    )
    return (
        scored.groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("median").alias("median"),
            F.max("mad").alias("mad"),
            F.count_if(F.col("__mz") > F.lit(float(z_cutoff))).alias("n_outliers"),
        )
        .withColumnRenamed("__g", group_col)
        .orderBy(group_col)
    )


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    fractions: list[float],
) -> DataFrame:
    """Per-group EXACT interpolated quantiles (``quantile_cont``
    semantics: index h = (n-1)*q + 1, linear interpolation between the
    two bracketing order statistics) at every fraction in ONE pass of
    the rank machinery — and, like :func:`grouped_median_mad`, with no
    per-group value buffer: Spark's exact ``F.percentile`` collects
    each group's values into a single task's buffer, which melts on a
    mega-group; here the group-leading ranking selects only the <= 2
    bracketing rows per (group, fraction).

    The interpolation is spelled ``lo + (h - floor(h)) * (hi - lo)``
    IDENTICALLY in the oracle — engines' built-in quantile lerp
    variants (``(1-w)*lo + w*hi`` vs this form) round differently, so
    the contract is the explicit formula, not the builtin.  Returns
    ``(group_col, fraction, n, value)`` ordered by group, fraction.
    NULL groups/values excluded."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(not 0.0 <= q <= 1.0 for q in fractions):
        raise ValueError(f"fractions must be in [0, 1], got {fractions}")
    clean = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(id_col).alias("__tb"),
    ).filter(F.col("__g").isNotNull() & F.col("__v").isNotNull())
    ranked = grouped_row_number(
        clean, "__g", [F.col("__v"), F.col("__tb")], out_col="__grn", n_col="__n"
    )
    # a row brackets fraction q when its within-group rank equals
    # lo = floor(h) or hi = ceil(h), h = (n-1)*q + 1; all fractions are
    # tested in ONE pass over the ranking with an array higher-order
    # filter + explode of the (<=|fractions|) matches. The earlier
    # one-leg-per-fraction union re-evaluated the whole rank subtree
    # per fraction (5 fractions = 21 parquet scans in q237's plan); the
    # row multiset, h arithmetic and output are identical.
    fr = F.array(*[F.lit(float(q)) for q in fractions])
    matched = F.filter(
        fr,
        lambda q: (F.col("__grn") == F.floor((F.col("__n") - 1) * q + 1))
        | (F.col("__grn") == F.ceil((F.col("__n") - 1) * q + 1)),
    )
    picked = (
        ranked.withColumn("__qs", matched)
        .filter(F.size("__qs") > 0)
        .select("__g", "__v", "__n", F.explode("__qs").alias("__q"))
        .withColumn("__h", (F.col("__n") - 1) * F.col("__q") + 1)
    )
    # per (group, fraction): min row = lo statistic, max row = hi
    # statistic (equal when h is integral); explicit lerp
    agg = picked.groupBy("__g", "__q").agg(
        F.max("__n").alias("n"),
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
        F.max("__h").alias("__hmax"),
    )
    value = F.col("__lo") + (
        F.col("__hmax") - F.floor("__hmax")
    ) * (F.col("__hi") - F.col("__lo"))
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__q").alias("fraction"),
        "n",
        F.round(value, 6).alias("value"),
    ).orderBy(group_col, "fraction")
