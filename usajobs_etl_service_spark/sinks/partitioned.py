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


def compact_partitions(
    spark: SparkSession,
    path: str,
    *,
    partition_cols: Sequence[str],
    target_rows_per_file: int = 1_000_000,
    predicate: str | None = None,
) -> int:
    """Rewrite the selected partitions with right-sized files — the
    small-files remedy for an incrementally-landed table (every
    micro-batch/backfill append leaves file counts growing; scans then
    pay per-file open cost and tiny row groups defeat pushdown).

    Reads only the partitions matching ``predicate`` (partition pruning
    — the rest of the table is never touched), repartitions each to
    ``ceil(rows / target_rows_per_file)`` files ON ITS PARTITION KEY
    VALUES, and rewrites exactly those partitions via the same dynamic
    overwrite as `overwrite_partitions` — so a crash mid-compaction
    never corrupts untouched partitions. Returns the number of
    partitions rewritten.

    The per-partition row counts come from ONE count aggregate (driver
    receives #selected-partitions rows, not data).
    """
    from pyspark.sql import functions as F

    df = read_partitioned(spark, path)
    if predicate:
        df = df.filter(predicate)
    sizes = df.groupBy(*partition_cols).count().collect()
    if not sizes:
        return 0
    max_rows = max(r["count"] for r in sizes)
    k = int(-(-max_rows // target_rows_per_file))  # files for the worst partition
    # deterministic salt (stable row hash, NOT rand()): a retried task
    # re-derives the same assignment, so the shuffle is replay-safe
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(k))
    compacted = df.repartition(
        int(k * len(sizes)), *[F.col(c) for c in partition_cols], salt
    )
    overwrite_partitions(compacted, path, partition_cols=partition_cols)
    return len(sizes)
