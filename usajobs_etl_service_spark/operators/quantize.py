"""Int8 embedding quantization — the storage/bandwidth compressor a
100 TB embedding store runs before anything else touches the vectors.

Scheme: symmetric per-vector linear quantization (the standard int8
recipe in public vector-database and inference literature):

    scale = max_i |v_i| / 127
    q_i   = clamp(round(v_i / scale), -127, 127)    (int8)
    v'_i  = q_i * scale                              (dequantize)

4x smaller than float32 (plus a double scale per vector), with worst-
case per-element error scale/2. Per-VECTOR scaling (not per-corpus)
makes the error relative to each vector's own magnitude and needs no
global pass — each row quantizes independently inside the scan stage.

Spark-first shape: everything is built-in higher-order functions over
``array<double>`` — one fold for the max-abs, one ``transform`` for
the codes — no UDF, no shuffle, no driver round-trip. The computed
``__scale`` alias is MULTI-use (codes transform + output column), so
CollapseProject does not inline the max-abs fold into the per-element
lambda (the r7 single-use-alias trap; see SCALE.md HOF audit).

Engine parity: round() is half-away-from-zero in both Spark
(HALF_UP) and DuckDB, divisions and the fold are IEEE double ops in
deterministic order, so the q187 oracle reproduces the codes exactly.

Complements the PQ family (operators/pq.py): PQ is the ANN-probe
compressor (codebook lookups, lossy by design); int8 is the
keep-the-vectors compressor (4x, ~0.4% worst-case error) that still
supports exact-ish rescoring.

No reference-repo counterpart — part of the beyond-reference
large-scale pipeline surface (SURVEY §2.11 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings_int8(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """(id, qvec array<tinyint>, scale double) — one row per input
    vector. A zero/empty vector gets scale 0 and all-zero codes; a
    NULL embedding yields NULL qvec/scale (flows through, the engine
    NULL convention). Dequantize with ``dequantize_int8``."""
    v = F.col(embedding_col).cast("array<double>")
    staged = df.select(F.col(id_col), v.alias("__v"))
    max_abs = F.aggregate("__v", F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    staged = staged.withColumn("__scale", max_abs / F.lit(127.0))
    codes = F.when(
        F.col("__scale") == 0.0,
        F.transform("__v", lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            "__v",
            lambda x: F.greatest(
                F.lit(-127.0), F.least(F.lit(127.0), F.round(x / F.col("__scale"), 0))
            ).cast("tinyint"),
        )
    )
    return staged.select(
        F.col(id_col), codes.alias("qvec"), F.col("__scale").alias("scale")
    )


def dequantize_int8(df: DataFrame, *, qvec_col: str = "qvec", scale_col: str = "scale"):
    """array<double> reconstruction ``q_i * scale`` as a Column."""
    return F.transform(
        F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)
    )


def quantization_error_report(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Quantize + reconstruct in one pass and report per-vector
    fidelity: (id, scale, max_abs_err, mse) — the acceptance gate a
    pipeline runs before switching its store to int8. max_abs_err is
    bounded by scale/2 + float noise (asserted in tests); everything
    is rounded for cross-engine hash stability (the q92 float-sum
    contract: rounding boundaries are ~1e9 x wider than the
    summation-order noise)."""
    # one lineage, one scan, zero shuffles: re-deriving the codes
    # inline (instead of joining quantize_embeddings_int8's output
    # back on id) keeps the whole report in the scan stage
    v = F.col(embedding_col).cast("array<double>")
    staged = df.select(F.col(id_col), v.alias("__v"))
    max_abs = F.aggregate("__v", F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    staged = staged.withColumn("scale", max_abs / F.lit(127.0))
    err = F.when(
        F.col("scale") == 0.0, F.transform("__v", lambda x: F.abs(x))
    ).otherwise(
        F.transform(
            "__v",
            lambda x: F.abs(
                x
                - F.greatest(
                    F.lit(-127.0),
                    F.least(F.lit(127.0), F.round(x / F.col("scale"), 0)),
                )
                * F.col("scale")
            ),
        )
    )
    # __err is a multi-use alias (max fold + mse fold) -> not inlined
    staged = staged.withColumn("__err", err)
    mx = F.aggregate("__err", F.lit(0.0), lambda a, e: F.greatest(a, e))
    sse = F.aggregate("__err", F.lit(0.0), lambda a, e: a + e * e)
    return staged.select(
        F.col(id_col),
        F.round(F.col("scale"), 8).alias("scale"),
        F.round(mx, 8).alias("max_abs_err"),
        F.round(F.try_divide(sse, F.size("__err")), 12).alias("mse"),
    )
