"""Cross-group quantile normalization (Bolstad et al. 2003, the
microarray method, generalized to unequal group sizes).

A multi-source corpus scores documents with per-source tooling whose
raw scales disagree (one crawler's length/quality distribution is
shifted against another's); mixing on raw scores then over- or
under-samples whole sources.  Quantile normalization replaces each
row's value with the POOLED distribution's value at the row's
within-group quantile, so every group's normalized distribution is the
pooled one and thresholds mean the same thing everywhere.

Definition used (exact, integer-rank arithmetic — no interpolation, so
both engines agree bit-for-bit): a row at within-group rank ``r`` of
``n_g`` maps to the pooled order statistic at index

    idx = ceil((2r - 1) * N / (2 * n_g))      (midpoint quantile
                                               (r - 1/2) / n_g)

computed as ``((2r-1)*N + 2*n_g - 1) div (2*n_g)`` in pure integer
arithmetic.  Bounds hold without clamping: idx >= 1 because the
numerator is positive, and idx <= N because
``(2r-1)*N + 2n-1 <= (2n-1)*N + 2n-1 <= 2n*N + (2n-1-N) <= 2n(N+1)-1``
with ``N >= n_g``.

Scale shape: both rank passes go through
:func:`distributed_order.global_row_number` (one materialized range
exchange each — never a no-partition window over data); per-group
sizes/offsets are ``min(rn)``/``count`` over the already-ranked frame
(one hash exchange with a |groups|-row result, broadcast back); the
normalization itself is an integer-key equi join of the two ranked
streams.  Nothing in the plan holds more than one partition's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.distributed_order import (
    global_row_number,
    grouped_row_number,
)

__all__ = ["quantile_normalize"]


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    out_col: str = "normalized",
) -> DataFrame:
    """Map every row's ``value_col`` onto the pooled distribution at
    its within-group midpoint quantile.  Returns the input columns
    (``id_col``, ``group_col``, ``value_col``) plus ``out_col``.
    Rows with a NULL group or value are excluded (ranks would be
    undefined).  ``id_col`` must be unique — it pins a deterministic
    rank order inside value ties."""
    base = df.select(id_col, group_col, value_col).filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    )
    # within-group rank + size: one group-leading global ranking
    # (distributed_order.grouped_row_number — the contiguity argument
    # lives there)
    ranked = grouped_row_number(
        base,
        group_col,
        [F.col(value_col), F.col(id_col)],
        out_col="__r",
        n_col="__ng",
    )
    totals = ranked.agg(F.count(F.lit(1)).alias("__n"))
    within = (
        ranked.crossJoin(F.broadcast(totals))
        .withColumn(
            "__idx",
            # DECIMAL(38,0) intermediates: (2r-1)*N reaches ~2N^2 and
            # would overflow int64 beyond ~2.1e9 rows (ANSI: runtime
            # error; non-ANSI: silently negative -> dropped join rows).
            # Spark's integral-divide on decimals returns LONG, and
            # idx <= N always fits it.
            F.expr(
                "((2 * CAST(__r AS DECIMAL(38,0)) - 1) * __n + 2 * __ng - 1)"
                " div (2 * __ng)"
            ),
        )
    )
    pooled = global_row_number(
        base.select(F.col(value_col).alias("__pv"), F.col(id_col).alias("__pid")),
        [F.col("__pv"), F.col("__pid")],
        out_col="__prn",
    ).select("__prn", "__pv")
    return (
        within.join(pooled, within["__idx"] == pooled["__prn"])
        .select(
            id_col,
            group_col,
            value_col,
            F.col("__pv").alias(out_col),
        )
    )
