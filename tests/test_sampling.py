"""Deterministic sampling: reproducibility, rate accuracy, stratified
weights, and stability under repartitioning (where df.sample fails)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.sampling import hash_sample, sample_key, stratified_sample
from usajobs_etl_service_spark.session import read_table


def test_deterministic_across_runs_and_partitioning(spark):
    df = spark.range(10_000)
    a = {r["id"] for r in hash_sample(df, 0.3, key_col="id").collect()}
    b = {r["id"] for r in hash_sample(df.repartition(17), 0.3, key_col="id").collect()}
    assert a == b  # partitioning-independent — df.sample() is not


def test_rate_accuracy(spark):
    df = spark.range(20_000)
    n = hash_sample(df, 0.25, key_col="id").count()
    assert abs(n / 20_000 - 0.25) < 0.02


def test_different_seeds_differ(spark):
    df = spark.range(5_000)
    a = {r["id"] for r in hash_sample(df, 0.5, key_col="id", seed=1).collect()}
    b = {r["id"] for r in hash_sample(df, 0.5, key_col="id", seed=2).collect()}
    assert a != b and abs(len(a) - len(b)) < 500


def test_stratified_rates(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    rates = {"click": 1.0, "view": 0.5, "error": 0.0}
    sampled = stratified_sample(events, "event_type", rates, key_col="event_id")
    got = {r["event_type"]: r["n"] for r in sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["event_type"]: r["n"] for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("click") == full["click"]  # rate 1.0 keeps all
    assert "error" not in got  # rate 0.0 drops all
    assert "signup" not in got  # default_rate 0.0
    assert 0.3 < got["view"] / full["view"] < 0.7  # ~0.5


def test_rejects_bad_rate(spark):
    df = spark.range(10)
    with pytest.raises(ValueError):
        hash_sample(df, 1.5, key_col="id")
    with pytest.raises(ValueError):
        stratified_sample(df, "id", {"x": -0.1}, key_col="id")
