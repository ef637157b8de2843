"""Privacy-risk audit over a table with quasi-identifiers: k-anonymity
equivalence-class analysis and l-diversity (Sweeney 2002,
"k-anonymity: a model for protecting privacy"; Machanavajjhala et al.
2006, "l-diversity"). The release-gate a dataset must pass before
rows about people leave the pipeline — the auditing counterpart to the
q68 PII *redaction* stage (scrubbing direct identifiers does nothing
about re-identification through quasi-identifier combinations, which
is what these measure).

An equivalence class is one combination of quasi-identifier values.
A table is k-anonymous iff every class holds >= k rows; a class is
l-diverse (distinct flavor) iff its sensitive attribute takes >= l
distinct values — a k-anonymous class where everyone shares one
diagnosis still leaks it (the homogeneity attack).

Scale shape: ONE aggregate keyed by the quasi columns (map-side
combine; class count is bounded by the quasi-value cross product, not
the row count); the summary is a second aggregate over the classes.
No joins, no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kanonymity_classes", "kanonymity_summary"]


def kanonymity_classes(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
    sensitive_col: str | None = None,
    l: int | None = None,
) -> DataFrame:
    """Per-equivalence-class audit: the quasi columns, ``n`` (class
    size), ``k_ok`` (n >= k), and — when ``sensitive_col`` is given —
    ``n_sensitive`` (distinct sensitive values) and ``l_ok``
    (n_sensitive >= l). NULL quasi values form their own classes
    (a NULL ZIP code is still a ZIP-code bucket an attacker can
    match on)."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if (l is not None) and sensitive_col is None:
        raise ValueError("l-diversity needs sensitive_col")
    aggs = [F.count(F.lit(1)).alias("n")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"))
    out = df.groupBy(*quasi_cols).agg(*aggs)
    out = out.withColumn("k_ok", F.col("n") >= F.lit(k))
    if sensitive_col is not None and l is not None:
        out = out.withColumn("l_ok", F.col("n_sensitive") >= F.lit(l))
    return out


def kanonymity_summary(classes: DataFrame, *, k: int = 5) -> DataFrame:
    """One-row release report over :func:`kanonymity_classes` output:
    class counts, rows at risk (rows living in sub-k classes — each
    one a person re-identifiable to <= k-1 candidates), and the
    table-level min class size (the table's actual k)."""
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("n").alias("n_rows"),
        F.count_if(~F.col("k_ok")).alias("n_violating_classes"),
        F.sum(F.when(~F.col("k_ok"), F.col("n")).otherwise(F.lit(0))).alias(
            "rows_at_risk"
        ),
        F.min("n").alias("table_k"),
    ]
    if "l_ok" in classes.columns:
        aggs.append(F.count_if(~F.col("l_ok")).alias("n_homogeneous_classes"))
    return classes.agg(*aggs)


def generalization_ladder(
    df: DataFrame,
    levels: list[tuple[str, list]],
    *,
    k: int = 5,
) -> DataFrame:
    """k-anonymity REPAIR: walk a generalization hierarchy (each level
    a coarser quasi-identifier rendering — nation -> region -> '*')
    and report, per level, the class count and the minimum class size,
    with ``chosen`` marking the FIRST level that satisfies k — the
    release decision as data, not driver logic (a lazy min-over-
    qualifying-levels window, so the whole ladder is one plan).

    ``levels``: ``[(name, [Column, ...]), ...]`` ordered most-specific
    first. Each level costs one aggregate over the table; the ladder
    output is |levels| rows. Suppression (dropping sub-k classes) and
    cell-level generalization are the caller's next moves; this
    operator prices the ladder so that choice is informed.
    """
    from functools import reduce

    from pyspark.sql import Window

    if not levels:
        raise ValueError("need at least one generalization level")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    per_level = []
    for i, (name, cols) in enumerate(levels):
        classes = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
        per_level.append(
            classes.agg(
                F.lit(i).alias("level"),
                F.lit(name).alias("rendering"),
                F.count(F.lit(1)).alias("n_classes"),
                F.min("n").alias("min_class"),
                (F.min("n") >= F.lit(k)).alias("k_ok"),
            )
        )
    ladder = reduce(lambda a, b: a.unionByName(b), per_level)
    w = Window.partitionBy()
    first_ok = F.min(F.when(F.col("k_ok"), F.col("level"))).over(w)
    return ladder.withColumn("chosen", F.col("level") == first_ok).orderBy("level")


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    attribute-disclosure guard k-anonymity/l-diversity miss: a class
    can be k-large and l-diverse while its sensitive-value
    DISTRIBUTION still leaks (90% one disease). Per equivalence
    class: Earth Mover's Distance to the GLOBAL sensitive
    distribution under the ordered ground metric
    (``emd = sum_i |cumP_i - cumQ_i| / (m-1)`` over the m ordered
    support values) plus the total-variation distance
    (``tvd = sum |p - q| / 2`` — the categorical form), and the
    ``t_ok`` gate on the EMD.

    Scale shape: the sensitive SUPPORT must be modest (categories, or
    a continuous attribute pre-binned via ``encoding.quantile_bin`` —
    the paper's own setting); the support rides as a BROADCAST
    (value, q, cumQ) table, each class cross-joins it to densify
    absent values (p=0 still moves mass), and the one per-class
    cumulative window runs over |support| rows with the class hash
    partition — the only data-sized shuffles are the two counting
    aggregates. NULL quasi values form their own classes (the
    kanonymity_classes rule); NULL sensitive values are excluded.
    Support order is the value's natural sort — deterministic in any
    engine."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    if not 0.0 < t <= 1.0:
        raise ValueError(f"t must be in (0, 1], got {t}")
    clean = df.filter(F.col(sensitive_col).isNotNull())
    # global support: q per value + its ordered cumulative (bounded,
    # computed once; the no-partition window runs over the support
    # only — the _offsets posture). total and the support size come
    # from ONE aggregate job (they were two sequential count() jobs —
    # construction-time cost bench.py times on every repeat)
    _tm = clean.agg(
        F.count(F.lit(1)).alias("__t"),
        F.count_distinct(F.col(sensitive_col)).alias("__m"),
    ).first()
    total, m = _tm["__t"], _tm["__m"]
    support = (
        clean.groupBy(F.col(sensitive_col).alias("__sv"))
        .agg(F.count(F.lit(1)).alias("__nv"))
        .withColumn("__q", F.col("__nv") / F.lit(float(total)))
        .withColumn(
            "__cumq",
            F.sum("__q").over(
                Window.orderBy("__sv").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("__sv", "__q", "__cumq")
    )
    sizes = clean.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    cells = clean.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__sv")
    ).agg(F.count(F.lit(1)).alias("__ncv"))
    grid = (
        sizes.crossJoin(F.broadcast(support))
        .join(cells, [*quasi_cols, "__sv"], "left")
        .withColumn("__p", F.coalesce(F.col("__ncv"), F.lit(0)) / F.col("n"))
    )
    wc = Window.partitionBy(*quasi_cols).orderBy("__sv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scored = grid.withColumn("__cump", F.sum("__p").over(wc))
    agg = scored.groupBy(*quasi_cols).agg(
        F.max("n").alias("n"),
        # the last cumulative term is identically 1-1=0; summing all m
        # then dividing by m-1 equals the paper's first-(m-1) sum.
        # m=1 (single-point global distribution): every class matches
        # it trivially, and the sum is identically 0 — max(m-1,1)
        # keeps the division defined so emd=0, not NULL/Inf.
        (F.sum(F.abs(F.col("__cump") - F.col("__cumq"))) / F.lit(float(max(m - 1, 1))))
        .alias("__emd"),
        (F.sum(F.abs(F.col("__p") - F.col("__q"))) / F.lit(2.0)).alias("__tvd"),
    )
    return agg.select(
        *quasi_cols,
        "n",
        F.round("__emd", 6).alias("emd"),
        F.round("__tvd", 6).alias("tvd"),
        (F.round("__emd", 6) <= F.lit(float(t))).alias("t_ok"),
    ).orderBy(*quasi_cols)
