"""Int8 embedding quantization (operators/quantize.py): error bound,
degenerate vectors, dequant round-trip, and the zero-shuffle plan."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.quantize import (
    dequantize_int8,
    quantization_error_report,
    quantize_embeddings_int8,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = random.Random(11)
    rows = [(i, [rng.gauss(0.0, 0.5) for _ in range(16)]) for i in range(40)]
    rows.append((100, [0.0] * 16))  # zero vector
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codes_match_python_reference_and_bounds(spark, vecs):
    got = {r["vec_id"]: r for r in quantize_embeddings_int8(vecs).collect()}
    for row in vecs.collect():
        vid, v = row["vec_id"], row["embedding"]
        scale = max(abs(x) for x in v) / 127.0
        want = (
            [0] * len(v)
            if scale == 0
            else [
                int(max(-127.0, min(127.0, math.floor(abs(x / scale) + 0.5) * (1 if x >= 0 else -1))))
                for x in v
            ]
        )
        assert list(got[vid]["qvec"]) == want, vid
        assert abs(got[vid]["scale"] - scale) < 1e-15
        assert all(-127 <= c <= 127 for c in got[vid]["qvec"])
    assert dict(quantize_embeddings_int8(vecs).dtypes)["qvec"] == "array<tinyint>"


def test_error_report_bounded_by_half_scale(spark, vecs):
    rows = quantization_error_report(vecs).collect()
    assert len(rows) == 41
    for r in rows:
        # worst-case quantization error is scale/2 (plus float noise)
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9, dict(r.asDict())
        assert r["mse"] <= (r["scale"] / 2) ** 2 + 1e-12
    zero = next(r for r in rows if r["vec_id"] == 100)
    assert (zero["scale"], zero["max_abs_err"], zero["mse"]) == (0.0, 0.0, 0.0)


def test_dequantize_roundtrip(spark, vecs):
    q = quantize_embeddings_int8(vecs)
    back = q.select("vec_id", dequantize_int8(q).alias("v2"))
    orig = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    for r in back.collect():
        v, v2 = orig[r["vec_id"]], r["v2"]
        scale = max(abs(x) for x in v) / 127.0
        assert all(abs(a - b) <= scale / 2 + 1e-9 for a, b in zip(v, v2))


def test_null_embedding_flows_as_null(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings_int8(df).collect()}
    assert rows[2]["qvec"] is None and rows[2]["scale"] is None
    assert list(rows[1]["qvec"]) == [64, -127]


def test_report_plan_is_one_pass_no_shuffle(spark, vecs):
    """The whole quantize+report must live in the scan stage: zero
    Exchange (no join back on id, no aggregate shuffle)."""
    p = (
        quantization_error_report(vecs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p, p[:800]
    assert "Join" not in p, p[:800]


def test_int8_topk_overlaps_float_topk(spark):
    """The rescoring claim: quantized-store top-k agrees closely with
    the float top-k (int8 error ~scale/2 barely moves cosines)."""
    from usajobs_etl_service_spark.operators.similarity import topk_cosine
    from usajobs_etl_service_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in topk_cosine(emb.filter(F.col("vec_id") != 0), qvec, k=20).collect()}
    q = quantize_embeddings_int8(emb)
    deq = q.select("vec_id", dequantize_int8(q).alias("embedding"))
    dq = [float(x) for x in deq.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = {r["vec_id"] for r in topk_cosine(deq.filter(F.col("vec_id") != 0), dq, k=20).collect()}
    assert len(exact & got) >= 15, (sorted(exact), sorted(got))


def test_null_element_and_empty_vector_quantize_to_null(spark):
    """Round-9 review finding: greatest/least skip NULLs, so a NULL
    element used to quantize to full-scale +127 — silent corruption.
    The contract now: NULL/empty/NULL-element vectors yield NULL qvec,
    scale, and NULL report stats (never a fake zero)."""
    df = spark.createDataFrame(
        [
            (1, [1.0, None, -0.5]),
            (2, []),
            (3, None),
            (4, [1.0, -2.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings_int8(df).collect()}
    for vid in (1, 2, 3):
        assert rows[vid]["qvec"] is None and rows[vid]["scale"] is None, vid
    assert list(rows[4]["qvec"]) == [64, -127]
    rep = {r["vec_id"]: r for r in quantization_error_report(df).collect()}
    for vid in (1, 2, 3):
        r = rep[vid]
        assert (r["scale"], r["max_abs_err"], r["mse"]) == (None, None, None), vid
    assert rep[4]["max_abs_err"] <= rep[4]["scale"] / 2 + 2e-8  # both rounded to 8dp


def test_nonfinite_elements_quantize_to_null(spark):
    """Round-10 review finding: a NaN element made scale NaN and forced
    EVERY code to the +127 clamp bound (greatest/least skip NaN like
    they skip NULL); an Inf element made scale Inf and every finite
    code 0. Both are now degenerate like NULL elements: NULL qvec,
    NULL scale, NULL report stats."""
    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [
            (1, [1.0, nan, -0.5]),
            (2, [1.0, inf]),
            (3, [1.0, -inf]),
            (4, [1.0, -2.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings_int8(df).collect()}
    for vid in (1, 2, 3):
        assert rows[vid]["qvec"] is None and rows[vid]["scale"] is None, vid
    assert list(rows[4]["qvec"]) == [64, -127]
    rep = {r["vec_id"]: r for r in quantization_error_report(df).collect()}
    for vid in (1, 2, 3):
        r = rep[vid]
        assert (r["scale"], r["max_abs_err"], r["mse"]) == (None, None, None), vid
