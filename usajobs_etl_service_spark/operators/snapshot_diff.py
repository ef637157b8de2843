"""Snapshot reconciliation: keyed diff of two table versions —
added / removed / changed rows with old and new values side by side.
The anti-entropy check a warehouse runs between a source extract and
its mirror (the reference's upsert world: verify the merge landed),
or between two days of a dimension.

One full outer join on the key — hash-partitioned both sides, no
broadcast assumption (both snapshots are corpus-sized). Change
detection compares the tracked columns null-safely (``eqNullSafe``:
NULL -> value and value -> NULL are real changes, NULL -> NULL is
not). Unchanged rows are dropped before anything else happens, so the
output is sized to the churn, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """(key, status, old_<c>, new_<c>...) for status in
    added | removed | changed."""
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")
    o = old.select(
        F.col(key_col).alias("__k_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key_col).alias("__k_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, o["__k_old"] == n["__k_new"], "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__k_old").isNull(), "added")
        .when(F.col("__k_new").isNull(), "removed")
        .when(~same, "changed")
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            F.coalesce(F.col("__k_old"), F.col("__k_new")).alias(key_col),
            "status",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
