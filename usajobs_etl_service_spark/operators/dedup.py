"""Deduplication operators: the reference's in-batch first-wins dedup
(A6/J2, reference ``etl/etl.py:452-465``) and the at-scale exact-dedup
extension (SURVEY.md §2.11).

Scale notes: both shapes are a single hash-partition shuffle on the key.
First-wins needs a deterministic order column — ``dropDuplicates`` alone
keeps an arbitrary row per key, which flakes hash-match tests AND makes
reruns non-reproducible on a cluster. The reader supplies ``ingest_seq``
(page*page_size + index) precisely so this window is deterministic. If a
key is pathologically hot, AQE skew handling applies only to joins — for
a skewed dedup key, pre-aggregate with a salted two-phase min().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_first_wins(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """A6: keep the first row per key by ``order_col`` (deterministic).

    One shuffle on ``key_cols``; the window never materializes more than
    a partition at a time. Output drops the helper rank column.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact dedup, any-row-per-key: ``dropDuplicates`` — hash aggregate,
    map-side partial, one shuffle. Use when no order is meaningful."""
    return df.dropDuplicates(key_cols)


def duplicate_stats(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys with >1 occurrence and their counts (the reference logs each
    dropped dupe, etl.py:459-463; at scale you want the aggregate, not a
    log line per row)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") > 1)
    )
