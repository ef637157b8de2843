"""Semantic tests for operators/snapshot_diff.py (cross-engine equality
is the q108 oracle-parity row)."""

from __future__ import annotations

import pytest

from usajobs_etl_service_spark.operators.snapshot_diff import snapshot_diff

SCHEMA = "k long, v double, tag string"


def test_diff_statuses_and_values(spark):
    old = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "c")], SCHEMA
    )
    new = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 9.0, "b"), (4, 4.0, "d")], SCHEMA
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, key_col="k", compare_cols=["v", "tag"]).collect()}
    assert set(rows) == {2, 3, 4}  # unchanged key 1 dropped
    assert rows[2]["status"] == "changed" and rows[2]["old_v"] == 2.0 and rows[2]["new_v"] == 9.0
    assert rows[3]["status"] == "removed" and rows[3]["new_v"] is None
    assert rows[4]["status"] == "added" and rows[4]["old_v"] is None


def test_diff_null_transitions_are_changes_but_null_null_is_not(spark):
    old = spark.createDataFrame([(1, None, "a"), (2, 2.0, "b"), (3, None, "c")], SCHEMA)
    new = spark.createDataFrame([(1, 1.0, "a"), (2, None, "b"), (3, None, "c")], SCHEMA)
    rows = {r["k"]: r for r in snapshot_diff(old, new, key_col="k", compare_cols=["v"]).collect()}
    assert set(rows) == {1, 2}  # NULL->NULL on key 3 is unchanged
    assert rows[1]["status"] == "changed" and rows[2]["status"] == "changed"


def test_diff_requires_compare_cols(spark):
    df = spark.createDataFrame([(1, 1.0, "a")], SCHEMA)
    with pytest.raises(ValueError):
        snapshot_diff(df, df, key_col="k", compare_cols=[])