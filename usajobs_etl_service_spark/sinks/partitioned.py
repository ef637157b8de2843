"""Partitioned table sink with dynamic-partition (idempotent backfill)
overwrite.

Reference capability: the reference re-runs its whole load and relies
on ON CONFLICT to make the rerun idempotent
(/root/reference/etl/etl.py:467-488). At lake scale the analogous
primitive is partition-granular: a backfill recomputes one day/source
slice and must replace EXACTLY the partitions it produced, leaving
every other partition untouched. That is Spark's dynamic partition
overwrite (``spark.sql.sources.partitionOverwriteMode=dynamic``) —
static mode would wipe the whole table root first, which on a 100 TB
table is catastrophic, so this module never allows it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def overwrite_partitions(
    df: DataFrame, path: str, *, partition_cols: Sequence[str]
) -> None:
    """Overwrite ONLY the partitions present in ``df`` under ``path``
    (hive-style layout). Reruns are idempotent; untouched partitions
    survive. The dynamic mode is set per-write via option() so the
    session default is never mutated."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty (use plain overwrite otherwise)")
    missing = [c for c in partition_cols if c not in df.columns]
    if missing:
        raise ValueError(f"df missing partition columns: {missing}")
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the hive-partitioned table back (partition columns are
    reconstructed from the directory layout)."""
    return spark.read.parquet(path)
