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

    ``predicate`` SELECTS PARTITIONS, never rows: the partitions it
    matches are rewritten in full (matched partition values ->
    left_semi back onto the unfiltered table), so a predicate on a
    non-partition column can narrow which partitions are touched but
    can never drop rows from them. Each selected partition is rewritten
    to its own ``ceil(rows / target_rows_per_file)`` files via a
    per-partition deterministic salt. Returns the number of partitions
    rewritten.

    Commit safety (ADVICE r6): the compacted rows are FIRST written to
    a sibling staging directory (``<path>.compact_staging``), and only
    then dynamic-overwritten into the table FROM the staged copy —
    never straight from a plan that reads the very partitions the
    commit deletes. Unselected partitions are untouched by dynamic
    overwrite; for selected partitions, every point of the commit has
    a durable copy of the data: a crash before the overwrite leaves
    the table as it was, a crash DURING the delete+rename commit
    window leaves the full compacted partition in staging for manual
    restore (the staging dir is only removed after a successful
    commit). A pre-existing staging dir from a crashed run makes the
    next call fail fast instead of silently discarding the evidence.
    This is the same write-new-files-then-swap posture as lakehouse
    compaction (Delta OPTIMIZE), minus the atomic metadata pointer a
    table format would add.

    The per-partition row counts come from ONE count aggregate (driver
    receives #selected-partitions rows, not data).
    """
    from pyspark.sql import functions as F

    full = read_partitioned(spark, path)
    selected = full.filter(predicate) if predicate else full
    sizes = selected.groupBy(*partition_cols).count().collect()
    if not sizes:
        return 0
    # full rows of every selected partition — row-level predicate
    # effects must NOT survive into the rewrite (that would delete data)
    matched = spark.createDataFrame(
        [tuple(r[c] for c in partition_cols) for r in sizes],
        selected.select(*partition_cols).schema,
    )
    part_rows = full.join(F.broadcast(matched), list(partition_cols), "left_semi")
    # per-partition file count k_p = ceil(rows_p / target); the salt
    # modulus joins back per partition so small partitions stay 1 file.
    # deterministic salt (stable row hash, NOT rand()): a retried task
    # re-derives the same assignment, so the shuffle is replay-safe
    k_rows = [
        tuple(r[c] for c in partition_cols)
        + (int(-(-r["count"] // target_rows_per_file)),)
        for r in sizes
    ]
    k_df = spark.createDataFrame(
        k_rows, selected.select(*partition_cols).schema.add("_k", "integer")
    )
    total_files = sum(r[-1] for r in k_rows)
    salted = part_rows.join(F.broadcast(k_df), list(partition_cols)).withColumn(
        "_salt", F.pmod(F.xxhash64(*part_rows.columns), F.col("_k"))
    )
    compacted = salted.repartition(
        int(total_files), *[F.col(c) for c in partition_cols], F.col("_salt")
    ).drop("_k", "_salt")

    # stage -> commit -> clean: see docstring's commit-safety contract
    staging = path.rstrip("/") + ".compact_staging"
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    staging_p = jvm.org.apache.hadoop.fs.Path(staging)
    fs = staging_p.getFileSystem(hconf)
    if fs.exists(staging_p):
        raise RuntimeError(
            f"compaction staging dir already exists: {staging} — a prior "
            "run crashed mid-commit. Inspect/restore its partitions into "
            f"{path} (they are complete compacted copies), then delete it."
        )
    compacted.write.mode("errorifexists").partitionBy(*partition_cols).parquet(staging)
    staged = spark.read.schema(full.schema).parquet(staging)
    overwrite_partitions(staged, path, partition_cols=partition_cols)
    fs.delete(staging_p, True)
    return len(sizes)
