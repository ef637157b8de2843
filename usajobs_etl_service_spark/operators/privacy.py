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

from pyspark.sql import DataFrame
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
