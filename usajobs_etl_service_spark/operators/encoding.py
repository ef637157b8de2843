"""Categorical feature encoding for ML training data: K-fold
leakage-safe target encoding and Weight-of-Evidence / Information
Value — the feature-engineering stage between a curated corpus and a
trained model (Micci-Barreca 2001, "A preprocessing scheme for
high-cardinality categorical attributes"; WOE/IV is the standard
credit-scoring formulation).

Target encoding replaces a category with the mean of the label over
OTHER rows of the same category. Naive same-row inclusion leaks the
label into the feature; the K-fold form excludes the row's whole fold:

    te(c, f) = (sum(c) - sum(c, f) + m * prior) / (cnt(c) - cnt(c, f) + m)

with additive smoothing ``m`` toward the global ``prior`` (which also
covers the degenerate case cnt(c) == cnt(c, f): a category living in
one fold encodes as the prior for its own rows). Fold assignment is
the repo-standard deterministic md5 uniform (sampling.sample_key — the
q94 split convention): a pure function of the row key, so folds are
stable across runs, repartitioning, and engines.

Scale shape (no UDFs, no collect, no open-vocabulary broadcast):

- ONE aggregate over (category, fold) — map-side combine bounds every
  task's output at |C| * k rows; per-category totals come from a
  window over the (category, fold) PARTIALS (|C| * k rows, not the
  fact table), so the full encoding table costs one fact-side shuffle.
- ``target_encode_apply`` joins the table back on (category, fold) —
  an equi-join Catalyst/AQE may broadcast when |C| * k is small but
  which stays a sound shuffle join for open vocabularies (the dsir.py
  broadcast-provability argument, inverted).

WOE/IV is one aggregate + one 2-row-bounded reduction:

    woe(c) = ln( ((good_c + 0.5) / good_total) / ((bad_c + 0.5) / bad_total) )
    iv     = sum_c (good_c / good_total - bad_c / bad_total) * woe(c)

(0.5 Laplace keeps zero cells finite; totals ride as a 1-row broadcast
— the bm25/dsir scalar pattern.)

The reference engine has no ML-feature surface (closest: the grouped
statistics view, init.sql:60-70); this extends the engine's
training-data story past curation (q40) into feature construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.sampling import sample_key

__all__ = [
    "fold_of",
    "target_encoding_table",
    "target_encode_apply",
    "woe_iv",
    "quantile_bin",
]


def fold_of(key: Column, k: int, *, seed: int = 42) -> Column:
    """Deterministic fold id in [0, k): floor of the md5 uniform.
    A NULL key yields a NULL fold (md5 of NULL propagates) — such rows
    form their own (category, NULL) cells; supply a non-null row key
    (the q94 split contract expects one)."""
    return F.floor(sample_key(key, seed=seed) * k).cast("int")


def target_encoding_table(
    df: DataFrame,
    *,
    category_col: str,
    label_col: str,
    key_col: str,
    k: int = 5,
    smoothing: float = 20.0,
    seed: int = 42,
) -> DataFrame:
    """Build the out-of-fold encoding table
    ``(category, fold, n_oof, te)`` — one row per (category, fold)
    observed in ``df``. ``n_oof`` is the out-of-fold support the
    encoding was computed from (0 => te == prior exactly)."""
    if k < 2:
        raise ValueError(f"k must be >= 2 for out-of-fold encoding, got {k}")
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    parts = (
        df.select(
            F.col(category_col).alias("category"),
            F.col(label_col).cast("double").alias("__y"),
            fold_of(F.col(key_col), k, seed=seed).alias("fold"),
        )
        .groupBy("category", "fold")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__s"))
    )
    w = Window.partitionBy("category")
    wg = Window.partitionBy()
    oof_n = F.sum("__n").over(w) - F.col("__n")
    oof_s = F.sum("__s").over(w) - F.col("__s")
    prior = F.sum("__s").over(wg) / F.sum("__n").over(wg)
    return parts.select(
        "category",
        "fold",
        oof_n.alias("n_oof"),
        (
            (oof_s + F.lit(smoothing) * prior)
            / (oof_n + F.lit(smoothing))
        ).alias("te"),
    )


def target_encode_apply(
    df: DataFrame,
    table: DataFrame,
    *,
    category_col: str,
    key_col: str,
    k: int = 5,
    seed: int = 42,
    out_col: str = "te",
) -> DataFrame:
    """Attach the out-of-fold encoding to every row of ``df``. The fold
    is re-derived from ``key_col`` (same seed => same assignment the
    table was built with). Rows whose (category, fold) is absent from
    the table keep a NULL encoding — the caller decides the unseen-
    category policy (impute prior, drop, ...) explicitly."""
    withf = df.withColumn("__fold", fold_of(F.col(key_col), k, seed=seed))
    t = table.select(
        F.col("category").alias("__cat"),
        F.col("fold").alias("__fold"),
        F.col("te").alias(out_col),
    )
    return (
        withf.join(
            t,
            (withf[category_col] == t["__cat"]) & (withf["__fold"] == t["__fold"]),
            "left",
        )
        .drop("__cat", "__fold")
    )


def woe_iv(
    df: DataFrame,
    *,
    category_col: str,
    label_col: str,
) -> DataFrame:
    """Weight-of-evidence per category + each category's IV term:
    ``(category, n_good, n_bad, woe, iv_term)``. ``label_col`` must be
    boolean-like (true/1 = "good"). Total IV = sum(iv_term)."""
    counts = (
        df.select(
            F.col(category_col).alias("category"),
            F.col(label_col).cast("boolean").alias("__g"),
        )
        .groupBy("category")
        .agg(
            F.count_if(F.col("__g")).alias("n_good"),
            F.count_if(~F.col("__g")).alias("n_bad"),
        )
    )
    totals = counts.agg(
        F.sum("n_good").cast("double").alias("gt"),
        F.sum("n_bad").cast("double").alias("bt"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    p_good = (F.col("n_good") + F.lit(0.5)) / F.col("gt")
    p_bad = (F.col("n_bad") + F.lit(0.5)) / F.col("bt")
    woe = F.log(p_good / p_bad)
    return j.select(
        "category",
        "n_good",
        "n_bad",
        woe.alias("woe"),
        ((F.col("n_good") / F.col("gt") - F.col("n_bad") / F.col("bt")) * woe).alias(
            "iv_term"
        ),
    )


def quantile_bin(
    df: DataFrame,
    *,
    value_col: str,
    n_bins: int = 10,
    out_col: str = "bin",
) -> DataFrame:
    """Equi-depth (quantile) binning of a numeric column: every row
    gains ``out_col`` in [0, n_bins) — the standard discretization in
    front of WOE/IV scoring or a monotone-feature contract. Boundaries
    are the exact interpolated ``i/n_bins`` percentiles (ONE aggregate
    pass producing n_bins - 1 values); assignment is expression-side —
    the boundary array rides a 1-row broadcast and the bin is the
    count of boundaries strictly below the value (``y > b`` — a value
    equal to a boundary falls in the LOWER bin, deterministically).
    Heavy ties can leave some bins empty (two equal boundaries span an
    empty half-open interval) — equi-depth is best-effort under ties
    by construction. NULL values get a NULL bin."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    y = F.col(value_col).cast("double")
    bounds = df.agg(
        F.percentile(
            y, F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
        ).alias("__bounds")
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out_col,
            F.when(
                y.isNotNull(),
                F.size(F.filter(F.col("__bounds"), lambda b: y > b)),
            ),
        )
        .drop("__bounds")
    )
