"""Poisson bootstrap CI (sampling.poisson_bootstrap_ci): weight-draw
replay, CI sanity, determinism, the zero-weight-replicate guard."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.sampling import (
    _POISSON1_CDF,
    poisson_bootstrap_ci,
    poisson_weight,
)


M31 = 2147483648


def _py_weight(key, b, seed=7):
    s = int(hashlib.md5(f"{key}#{seed}".encode()).hexdigest()[:8], 16) % M31
    h = (s + b * 1588635695) % M31
    h = (h * 1103515245 + 12345) % M31
    h ^= h >> 16
    h = (h * 1220703125) % M31
    h ^= h >> 13
    u = h / M31
    for k, t in enumerate(_POISSON1_CDF):
        if u < t:
            return k
    return len(_POISSON1_CDF)


def test_weight_matches_python_and_mean_near_one(spark):
    df = spark.range(500).select(
        F.col("id"),
        F.explode(F.sequence(F.lit(1), F.lit(8))).alias("b"),
    )
    rows = df.select(
        "id", "b", poisson_weight(F.col("id"), F.col("b")).alias("w")
    ).collect()
    for r in rows[:200]:  # covers all four digest lanes and two groups
        assert r["w"] == _py_weight(r["id"], r["b"]), (r["id"], r["b"])
    mean_w = sum(r["w"] for r in rows) / len(rows)
    assert mean_w == pytest.approx(1.0, abs=0.05)  # Poisson(1) mean


def test_ci_brackets_mean_and_is_deterministic(spark):
    rows = [(i, "g", float(i % 50)) for i in range(800)]
    df = spark.createDataFrame(rows, ["key", "grp", "y"])

    def run():
        return poisson_bootstrap_ci(
            df, group_col="grp", value_col="y", key_col="key", n_replicates=50
        ).collect()

    a, b = run(), run()
    assert a == b  # md5 draws: bit-identical across runs
    r = a[0]
    assert r["ci_lo"] < r["mean"] < r["ci_hi"]
    # the CI of a mean of 800 values on [0,49] is tight around 24.5
    assert r["ci_hi"] - r["ci_lo"] < 5.0
    assert r["n"] == 800


def test_singleton_group_zero_weight_replicates_dropped(spark):
    """A 1-row group draws w=0 in ~37% of replicates; those replicates
    must be dropped, not divide-by-zero the job (ANSI mode)."""
    df = spark.createDataFrame([(1, "solo", 10.0)], ["key", "grp", "y"])
    out = poisson_bootstrap_ci(
        df, group_col="grp", value_col="y", key_col="key", n_replicates=100
    ).collect()
    assert len(out) == 1
    # every surviving replicate mean is exactly 10 (w*10/w)
    assert out[0]["ci_lo"] == 10.0 and out[0]["ci_hi"] == 10.0


def test_validation(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], ["key", "grp", "y"])
    with pytest.raises(ValueError, match=">= 2"):
        poisson_bootstrap_ci(
            df, group_col="grp", value_col="y", key_col="key", n_replicates=1
        )
    with pytest.raises(ValueError, match="alpha"):
        poisson_bootstrap_ci(
            df, group_col="grp", value_col="y", key_col="key", alpha=1.5
        )
