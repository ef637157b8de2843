"""S9 — versioned snapshot export with retention (the Spark analog of
the reference's nightly ``pg_dump`` keeping the last 7,
docker-compose.prod.yml:89-96)."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def write_snapshot(df: DataFrame, base_path: str, *, keep_last: int = 7, partition_by: str | None = None) -> str:
    """Write a new ``snapshot=<millis>`` directory and prune old ones.
    Returns the new snapshot path."""
    tag = f"snapshot={int(time.time() * 1000)}"
    out = os.path.join(base_path, tag)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(out)
    prune_snapshots(base_path, keep_last=keep_last)
    return out


def list_snapshots(base_path: str) -> list[str]:
    if not os.path.isdir(base_path):
        return []
    return sorted(d for d in os.listdir(base_path) if d.startswith("snapshot="))


def prune_snapshots(base_path: str, *, keep_last: int = 7) -> list[str]:
    """Drop all but the newest ``keep_last`` snapshots; returns removed tags."""
    snaps = list_snapshots(base_path)
    removed = snaps[:-keep_last] if keep_last > 0 else snaps
    for tag in removed:
        shutil.rmtree(os.path.join(base_path, tag), ignore_errors=True)
    return removed


def read_latest_snapshot(spark: SparkSession, base_path: str) -> DataFrame:
    snaps = list_snapshots(base_path)
    if not snaps:
        raise FileNotFoundError(f"no snapshots under {base_path}")
    return spark.read.parquet(os.path.join(base_path, snaps[-1]))
