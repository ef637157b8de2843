"""barrier_filter: expensive predicates stay in projection position
(codegen + CSE), never collapse into an interpreted Filter."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from usajobs_etl_service_spark.functions.text import tokens_ws
from usajobs_etl_service_spark.operators.repetition import repetition_keep_tokens
from usajobs_etl_service_spark.plans.barrier import barrier_filter


def test_barrier_filter_matches_plain_filter(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(100)], "id long, v long")
    plain = sorted(r["id"] for r in df.filter(F.col("v") > 0).collect())
    gated = sorted(r["id"] for r in barrier_filter(df, F.col("v") > 0, "id").collect())
    assert gated == plain


def test_barrier_exact_with_duplicate_keys(spark):
    # duplicate keys with differing condition values: the gate must be
    # per-row, not first-row-of-key
    df = spark.createDataFrame([(1, 10), (1, -10), (2, 5), (2, -5)], "k long, v long")
    kept = sorted((r["k"], r["v"]) for r in barrier_filter(df, F.col("v") > 0, "k").collect())
    assert kept == [(1, 10), (2, 5)]


def test_barrier_keeps_hof_predicate_out_of_scan_and_filter(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "__rt", tokens_ws(F.lower(F.col("text")))
    )
    gated = barrier_filter(docs, repetition_keep_tokens(F.col("__rt")), "doc_id")
    plan = gated._jdf.queryExecution().executedPlan().toString()
    # the heavy expression must not appear in any Filter condition or
    # scan DataFilters — only the window-gate attribute is filtered
    filter_lines = [l for l in plan.splitlines() if l.strip().startswith(("Filter", "+- Filter"))]
    assert filter_lines and all("aggregate(" not in l for l in filter_lines), filter_lines
    scan_line = [l for l in plan.splitlines() if "DataFilters" in l]
    assert all("aggregate(" not in l for l in scan_line)


def test_barrier_is_faster_than_filter_position(spark, sf_dir):
    """The reason this module exists: >3x on the real documents table
    (measured ~40x at sf0.1; asserted loosely here at small sf)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "__rt", tokens_ws(F.lower(F.col("text")))
    )
    cond = repetition_keep_tokens(F.col("__rt"))
    for _ in range(2):  # warm both
        barrier_filter(docs, cond, "doc_id").count()
        docs.filter(cond).count()
    t0 = time.perf_counter()
    barrier_filter(docs, cond, "doc_id").count()
    fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    docs.filter(cond).count()
    slow = time.perf_counter() - t0
    assert slow > fast * 1.5, (slow, fast)
