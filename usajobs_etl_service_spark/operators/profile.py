"""One-pass table profiling: per-column null/distinct/extrema stats.

The operational primitive behind every "can I trust this table?"
question at 100 TB: a data-quality dashboard, a migration diff, a
schema-drift alarm. The whole profile is ONE aggregate pass over the
table — per-column metrics are parallel aggregate expressions in a
single HashAggregate (count + count(col) + count(distinct col) +
min + max per column; Spark plans the multi-distinct via one Expand),
then the 1-row result is unpivoted driver-free with ``stack``. Nothing
is per-column scans: profiling k columns costs one table read
regardless of k.

Extrema are rendered as strings so heterogeneous column types share
one output schema (the profile is a REPORT row, not a typed value);
bigint/string columns render identically across engines, which is what
the q183 oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value).

    ``n_distinct`` is EXACT (count distinct, NULLs excluded — the SQL
    convention); ``min_value``/``max_value`` are the column extrema
    cast to string (NULL when the column is all-NULL). One aggregate
    pass total.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table: need at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for j, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{j}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{j}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{j}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{j}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{j}, __nd_{j}, __mn_{j}, __mx_{j}"
        for j, c in enumerate(cols)
    )
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
