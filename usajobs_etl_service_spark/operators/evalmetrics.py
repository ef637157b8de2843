"""Distributed model-evaluation and rank statistics.

A training-data pipeline that ships classifier-gated corpora (q196's
fastText shape; reference parity: the reference's quality filters in
``/root/reference/etl/etl.py`` gate rows but never *measure* the gate)
needs the evaluation half: does the score actually separate good from
bad (AUC), are its probabilities honest (calibration / ECE), and do two
cohorts differ (Mann-Whitney)?  All three are RANK statistics, and the
naive Spark spelling — ``Window.orderBy(score)`` with no partition key —
moves every row through one task.  Everything here ranks through
:mod:`distributed_order` instead: ONE materialized range exchange, a
balanced per-partition window, and a per-partition carry-in, so the
plans hold at 100 TB.

Tie handling is exact, not approximate: ``_avg_ranks`` groups the
globally-numbered rows by score value, and the mean of the row numbers
inside a tie group IS the textbook average rank (mean of consecutive
integers = (first+last)/2), so AUC equals the Mann-Whitney U statistic
with the standard tie correction — bit-for-bit what a single-node
``scipy.stats.rankdata``-based implementation produces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.distributed_order import global_row_number


def _avg_ranks(
    df: DataFrame,
    score_col: str,
    tiebreak_col: str,
    extra_aggs: list[Column],
) -> DataFrame:
    """Per-distinct-score average rank plus caller aggregates.

    Ranks come from :func:`global_row_number` (one range exchange —
    never a no-partition window); the per-score group-by collapses tie
    groups so every downstream statistic sees the average rank.  The
    tiebreak column only pins a deterministic numbering WITHIN a tie
    group; the group mean is invariant to it.
    """
    ranked = global_row_number(
        df, [F.col(score_col), F.col(tiebreak_col)], out_col="__rn"
    )
    return ranked.groupBy(score_col).agg(
        F.avg("__rn").alias("avg_rank"),
        F.count(F.lit(1)).alias("tie_n"),
        *extra_aggs,
    )


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` against binary ``label_col``.

    AUC via the rank-sum identity
    ``AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)`` where
    ``R_pos`` is the sum of POOLED average ranks of the positives —
    ties contribute exactly 1/2, matching the trapezoidal ROC integral.
    Cost: one range exchange (ranking) + one hash exchange (the
    per-score tie collapse); the final fold is a scalar aggregate.
    Rows with a NULL score or label are excluded (scikit-learn's
    contract); the whole call stays ONE lazy plan — no job runs at
    construction.  Returns one row: ``n_pos, n_neg, auc``.
    """
    clean = df.select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
        F.col(tiebreak_col).alias("__tb"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    per_score = _avg_ranks(
        clean, "__s", "__tb", [F.sum("__y").alias("pos_n")]
    )
    return per_score.agg(
        F.sum("pos_n").cast("long").alias("n_pos"),
        (F.sum("tie_n") - F.sum("pos_n")).cast("long").alias("n_neg"),
        F.round(
            (
                F.sum(F.col("pos_n") * F.col("avg_rank"))
                - F.sum("pos_n") * (F.sum("pos_n") + 1) / 2
            )
            / (F.sum("pos_n") * (F.sum("tie_n") - F.sum("pos_n"))),
            6,
        ).alias("auc"),
    )


def mann_whitney(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    tiebreak_col: str,
) -> DataFrame:
    """Two-sided Mann-Whitney U with the tie-corrected normal
    approximation (no continuity correction — both engines then agree
    to float round-off, and the oracle replays the identical formula).

    ``U_a = R_a - n_a(n_a+1)/2`` from pooled average ranks;
    ``Var(U) = n_a n_b / 12 * ((n+1) - T / (n(n-1)))`` with
    ``T = sum(t^3 - t)`` over tie groups (Lehmann, *Nonparametrics*).
    One range exchange + one tie collapse, same as :func:`exact_auc`.
    Returns one row: ``n_a, n_b, u_a, z``.
    """
    base = df.select(
        F.col(value_col).alias("__s"),
        F.when(F.col(group_col) == group_a, 1)
        .when(F.col(group_col) == group_b, 0)
        .alias("__a"),
        F.col(tiebreak_col).alias("__tb"),
    ).filter(F.col("__a").isNotNull() & F.col("__s").isNotNull())
    per_score = _avg_ranks(base, "__s", "__tb", [F.sum("__a").alias("a_n")])
    n_a = F.sum("a_n")
    n_b = F.sum("tie_n") - F.sum("a_n")
    n = F.sum("tie_n")
    u_a = F.sum(F.col("a_n") * F.col("avg_rank")) - n_a * (n_a + 1) / 2
    # t*t*t, not pow(t,3): Math.pow is only 1-ulp-accurate — integer
    # multiplication is exact, and the oracle replays the same products
    tie_t = F.sum(
        F.col("tie_n") * F.col("tie_n") * F.col("tie_n") - F.col("tie_n")
    )
    var_u = n_a * n_b / 12 * ((n + 1) - tie_t / (n * (n - 1)))
    return per_score.agg(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.round(u_a, 6).alias("u_a"),
        F.round((u_a - n_a * n_b / 2) / F.sqrt(var_u), 6).alias("z"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    score_decimals: int = 6,
) -> DataFrame:
    """Reliability table + Expected Calibration Error (Naeini et al.
    2015 / Guo et al. 2017) for a probability score in [0, 1].

    Equal-width bins on the ROUNDED score (the q196 contract: a raw
    sigmoid within float noise of a bin edge would land in different
    bins across engines; ``round(score, score_decimals)`` pins the bin
    assignment).  The top edge closes the last bin
    (``min(floor(s*k), k-1)``).  Per bin: row count, mean score
    (confidence), mean label (accuracy), |gap|; ECE — the
    bin-weight-averaged |gap| — is attached to every row via a
    broadcast of the one-row total, so the whole report is a single
    pass + one tiny cross join.  Empty bins are absent (their ECE
    weight is zero).
    """
    s = F.round(F.col(score_col), score_decimals)
    binned = df.select(
        F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int").alias("bin"),
        s.alias("__s"),
        F.col(label_col).cast("double").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__s").alias("conf"),
        F.avg("__y").alias("acc"),
    )
    totals = per_bin.agg(
        F.sum("n").alias("__N"),
        F.round(
            F.sum(F.col("n") * F.abs(F.col("acc") - F.col("conf"))) / F.sum("n"),
            6,
        ).alias("ece"),
    )
    return (
        per_bin.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n",
            F.round("conf", 6).alias("confidence"),
            F.round("acc", 6).alias("accuracy"),
            F.round(F.abs(F.col("acc") - F.col("conf")), 6).alias("abs_gap"),
            "ece",
        )
        .orderBy("bin")
    )
