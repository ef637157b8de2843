"""S9 — versioned snapshot export with retention (the Spark analog of
the reference's nightly ``pg_dump`` keeping the last 7,
docker-compose.prod.yml:89-96)."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from usajobs_etl_service_spark.fs import delete_dir, list_dir


def write_snapshot(df: DataFrame, base_path: str, *, keep_last: int = 7, partition_by: str | None = None) -> str:
    """Write a new ``snapshot=<millis>`` directory and prune old ones.
    Returns the new snapshot path."""
    tag = f"snapshot={int(time.time() * 1000)}"
    out = f"{base_path.rstrip('/')}/{tag}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(out)
    prune_snapshots(base_path, keep_last=keep_last)
    return out


def list_snapshots(base_path: str) -> list[str]:
    # Hadoop FS listing: snapshots can live on any Spark-writable
    # filesystem (file:, hdfs:, s3a:, ...), not just the driver's disk
    return sorted(d for d in list_dir(base_path) if d.startswith("snapshot="))


def prune_snapshots(base_path: str, *, keep_last: int = 7) -> list[str]:
    """Drop all but the newest ``keep_last`` snapshots; returns removed tags."""
    snaps = list_snapshots(base_path)
    removed = snaps[:-keep_last] if keep_last > 0 else snaps
    for tag in removed:
        delete_dir(f"{base_path.rstrip('/')}/{tag}")
    return removed


def read_latest_snapshot(spark: SparkSession, base_path: str) -> DataFrame:
    snaps = list_snapshots(base_path)
    if not snaps:
        raise FileNotFoundError(f"no snapshots under {base_path}")
    return spark.read.parquet(f"{base_path.rstrip('/')}/{snaps[-1]}")
