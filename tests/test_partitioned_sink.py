"""Dynamic-partition overwrite sink (sinks/partitioned.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.sinks.partitioned import (
    overwrite_partitions,
    read_partitioned,
)


def _days(spark, rows):
    return spark.createDataFrame(rows, "day string, k long, v string")


def _state(spark, path):
    return {
        (r["day"], r["k"]): r["v"] for r in read_partitioned(spark, path).collect()
    }


def test_backfill_replaces_only_its_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    overwrite_partitions(
        _days(spark, [("d1", 1, "a"), ("d2", 2, "b"), ("d3", 3, "c")]),
        path,
        partition_cols=["day"],
    )
    # backfill day 2 with different rows (fewer AND changed)
    overwrite_partitions(
        _days(spark, [("d2", 9, "B2")]), path, partition_cols=["day"]
    )
    assert _state(spark, path) == {
        ("d1", 1): "a",
        ("d2", 9): "B2",
        ("d3", 3): "c",
    }


def test_rerun_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    batch = _days(spark, [("d1", 1, "a"), ("d2", 2, "b")])
    overwrite_partitions(batch, path, partition_cols=["day"])
    overwrite_partitions(batch, path, partition_cols=["day"])
    assert _state(spark, path) == {("d1", 1): "a", ("d2", 2): "b"}


def test_multi_column_partitioning(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("d1", "s1", 1), ("d1", "s2", 2), ("d2", "s1", 3)],
        "day string, src string, v long",
    )
    overwrite_partitions(df, path, partition_cols=["day", "src"])
    # rewrite only (d1, s2)
    overwrite_partitions(
        spark.createDataFrame([("d1", "s2", 99)], "day string, src string, v long"),
        path,
        partition_cols=["day", "src"],
    )
    got = {
        (r["day"], r["src"]): r["v"] for r in read_partitioned(spark, path).collect()
    }
    assert got == {("d1", "s1"): 1, ("d1", "s2"): 99, ("d2", "s1"): 3}


def test_param_validation(spark, tmp_path):
    df = _days(spark, [("d1", 1, "a")])
    with pytest.raises(ValueError, match="non-empty"):
        overwrite_partitions(df, str(tmp_path / "x"), partition_cols=[])
    with pytest.raises(ValueError, match="missing partition columns"):
        overwrite_partitions(df, str(tmp_path / "x"), partition_cols=["nope"])


def test_partition_pruning_on_readback(spark, tmp_path):
    # a day-filter on the readback must prune to that partition's files
    path = str(tmp_path / "t")
    overwrite_partitions(
        _days(spark, [("d1", 1, "a"), ("d2", 2, "b")]), path, partition_cols=["day"]
    )
    df = read_partitioned(spark, path).filter(F.col("day") == "d2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    assert df.count() == 1


def _files(path):
    import glob
    return [f for f in glob.glob(f"{path}/**/*.parquet", recursive=True)]


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    from usajobs_etl_service_spark.sinks.partitioned import compact_partitions

    path = str(tmp_path / "t")
    # land each day in many tiny files (repartition(8) per append)
    for day in ("d1", "d2"):
        df = spark.createDataFrame(
            [(day, i, f"v{i}") for i in range(64)], "day string, k long, v string"
        ).repartition(8)
        overwrite_partitions(df, path, partition_cols=["day"])
    before = len(_files(path))
    assert before >= 16  # 8 files per day
    before_rows = sorted(
        (r["day"], r["k"], r["v"]) for r in read_partitioned(spark, path).collect()
    )

    n = compact_partitions(
        spark, path, partition_cols=["day"], target_rows_per_file=1000
    )
    assert n == 2
    after = len(_files(path))
    assert after < before and after <= 4
    after_rows = sorted(
        (r["day"], r["k"], r["v"]) for r in read_partitioned(spark, path).collect()
    )
    assert after_rows == before_rows


def test_compaction_predicate_leaves_other_partitions_untouched(spark, tmp_path):
    import os

    from usajobs_etl_service_spark.sinks.partitioned import compact_partitions

    path = str(tmp_path / "t")
    for day in ("d1", "d2"):
        df = spark.createDataFrame(
            [(day, i, "x") for i in range(10)], "day string, k long, v string"
        ).repartition(4)
        overwrite_partitions(df, path, partition_cols=["day"])
    d2_files = {os.path.basename(f) for f in _files(path) if "/day=d2/" in f}

    n = compact_partitions(
        spark, path, partition_cols=["day"], predicate="day = 'd1'"
    )
    assert n == 1
    d2_after = {os.path.basename(f) for f in _files(path) if "/day=d2/" in f}
    assert d2_after == d2_files  # untouched partition keeps its exact files
    assert len([f for f in _files(path) if "/day=d1/" in f]) == 1


def test_compaction_predicate_selects_partitions_never_drops_rows(spark, tmp_path):
    # review finding: a row-level predicate must only CHOOSE partitions;
    # the chosen partitions are rewritten IN FULL.
    from usajobs_etl_service_spark.sinks.partitioned import compact_partitions

    path = str(tmp_path / "t")
    overwrite_partitions(
        _days(spark, [("d1", 1, "keep"), ("d1", 200, "alsokeep"), ("d2", 5, "x")]),
        path,
        partition_cols=["day"],
    )
    n = compact_partitions(
        spark, path, partition_cols=["day"], predicate="k > 100"
    )
    assert n == 1  # only d1 matched
    got = sorted(
        (r["day"], r["k"], r["v"]) for r in read_partitioned(spark, path).collect()
    )
    assert got == [("d1", 1, "keep"), ("d1", 200, "alsokeep"), ("d2", 5, "x")]


def test_compaction_small_partitions_stay_single_file(spark, tmp_path):
    # review finding: the salt modulus must be per-partition, or tiny
    # partitions get split into the worst partition's file count.
    from usajobs_etl_service_spark.sinks.partitioned import compact_partitions

    path = str(tmp_path / "t")
    big = spark.createDataFrame(
        [("big", i, "x") for i in range(3000)], "day string, k long, v string"
    ).repartition(6)
    small = spark.createDataFrame(
        [("small", i, "x") for i in range(5)], "day string, k long, v string"
    ).repartition(4)
    overwrite_partitions(big, path, partition_cols=["day"])
    overwrite_partitions(small, path, partition_cols=["day"])

    compact_partitions(spark, path, partition_cols=["day"], target_rows_per_file=1000)
    small_files = [f for f in _files(path) if "/day=small/" in f]
    big_files = [f for f in _files(path) if "/day=big/" in f]
    assert len(small_files) == 1
    assert len(big_files) <= 3
    assert read_partitioned(spark, path).count() == 3005


def test_compaction_stages_before_commit_and_fails_on_leftover(spark, tmp_path):
    """Commit safety (ADVICE r6): compaction must not overwrite the
    table straight from a plan reading the partitions being deleted.
    The staged copy is written first and removed after success; a
    leftover staging dir (crashed prior run) fails fast with recovery
    instructions instead of being clobbered."""
    import os

    from usajobs_etl_service_spark.sinks.partitioned import compact_partitions

    path = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 2).alias("p")
    )
    for _ in range(3):  # build up small files via appends
        overwrite_partitions(df, path, partition_cols=["p"])
    n = compact_partitions(spark, path, partition_cols=["p"], target_rows_per_file=1000)
    assert n == 2
    assert not os.path.exists(path + ".compact_staging")  # cleaned after commit
    assert spark.read.parquet(path).count() == 100

    os.makedirs(path + ".compact_staging")
    with pytest.raises(RuntimeError, match="staging dir already exists"):
        compact_partitions(spark, path, partition_cols=["p"], target_rows_per_file=1000)
