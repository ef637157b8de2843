"""Hashed linear classifier inference (operators/classifier.py):
Python bit-replay of the score, gating, degenerate inputs, and the
broadcast-lookup plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.classifier import (
    deterministic_weights,
    feature_bucket,
    hashed_linear_score,
)

WIDTH = 64


def _bucket(feat: str, width: int = WIDTH) -> int:
    return int(hashlib.md5((feat + "#ftx").encode()).hexdigest()[:8], 16) % width


def _weight(bucket: int, salt: str = "w0") -> float:
    h = int(hashlib.md5((str(bucket) + "#" + salt).encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def _score(text: str, *, bias: float = 0.0, bigrams: bool = True) -> tuple[int, float]:
    toks = text.lower().split()
    feats = list(toks)
    if bigrams:
        feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    wsum = sum(_weight(_bucket(f)) for f in feats)
    logit = bias + wsum / len(feats)
    return len(feats), round(1.0 / (1.0 + math.exp(-logit)), 4)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffles data between stages"),
            (2, "one"),
            (3, "   "),  # zero tokens -> dropped
            (4, "Mixed CASE mixed case"),
        ],
        ["doc_id", "text"],
    )


def test_score_matches_python_replay(spark, docs):
    w = deterministic_weights(spark, WIDTH)
    got = {
        r["doc_id"]: (r["n_features"], r["score"])
        for r in hashed_linear_score(docs, w, width=WIDTH).collect()
    }
    assert 3 not in got  # no tokens, no row
    assert got[1] == _score("spark shuffles data between stages")
    assert got[2] == _score("one")  # single token: no bigrams, n_features=1
    assert got[4] == _score("mixed case mixed case")


def test_unigram_only_mode(spark, docs):
    w = deterministic_weights(spark, WIDTH)
    got = {
        r["doc_id"]: (r["n_features"], r["score"])
        for r in hashed_linear_score(docs, w, width=WIDTH, bigrams=False).collect()
    }
    assert got[1] == _score("spark shuffles data between stages", bigrams=False)
    assert got[1][0] == 5  # 5 unigram instances only


def test_threshold_gate_and_bias(spark, docs):
    w = deterministic_weights(spark, WIDTH)
    rows = hashed_linear_score(
        docs, w, width=WIDTH, bias=50.0, threshold=0.5
    ).collect()
    # bias=50 saturates the sigmoid: everything keeps
    assert all(r["keep"] for r in rows)
    assert all(r["score"] == 1.0 for r in rows)


def test_missing_buckets_score_as_zero_weight(spark, docs):
    """An empty weight table = all-zero model: logit == bias exactly."""
    empty_w = deterministic_weights(spark, WIDTH).filter(F.lit(False))
    rows = hashed_linear_score(docs, empty_w, width=WIDTH, bias=0.0).collect()
    assert all(r["score"] == 0.5 for r in rows)


def test_feature_bucket_range_and_width_validation(spark, docs):
    vals = (
        docs.filter("doc_id = 1")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .select(feature_bucket(F.col("t"), 7).alias("b"))
        .collect()
    )
    assert all(0 <= r["b"] < 7 for r in vals)
    with pytest.raises(ValueError, match=">= 1"):
        hashed_linear_score(docs, deterministic_weights(spark, 4), width=0)


def test_plan_broadcasts_model_single_data_shuffle(spark, docs):
    """The model lookup must be a BroadcastHashJoin (never a shuffled
    join on an exploded feature stream) and the only hash exchange is
    the per-document aggregate."""
    w = deterministic_weights(spark, WIDTH)
    out = hashed_linear_score(docs, w, width=WIDTH)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1200]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1200]
