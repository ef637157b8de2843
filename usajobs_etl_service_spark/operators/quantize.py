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

NULL/degenerate contract (round-9/10 reviews): a vector that is NULL,
EMPTY, or contains a NULL/NaN/Inf element quantizes to NULL (qvec and scale
both NULL; report stats NULL) — quantizing around a missing element
would silently write a full-scale code for it (greatest/least skip
NULLs: clamp(round(NULL)) evaluates to 127 — verified, exactly the
corruption this guard exists to stop). A non-empty ALL-ZERO vector is
well-defined: scale 0, all-zero codes, zero error.

Spark-first shape: everything is built-in higher-order functions over
``array<double>`` — one fold for the max-abs, one ``transform`` for
the codes — no UDF, no shuffle, no driver round-trip. The computed
``__scale`` alias is MULTI-use (codes transform + output column), so
CollapseProject does not inline the max-abs fold into the per-element
lambda (the r7 single-use-alias trap; see SCALE.md HOF audit).

Engine parity: round() is half-away-from-zero in both Spark
(HALF_UP) and DuckDB, divisions and the fold are IEEE double ops in
deterministic order, so the q187/q188 oracles reproduce the codes
exactly (including the NULL/empty guards).

Complements the PQ family (operators/pq.py): PQ is the ANN-probe
compressor (codebook lookups, lossy by design); int8 is the
keep-the-vectors compressor (4x, ~0.4% worst-case error) that still
supports exact-ish rescoring.

No reference-repo counterpart — part of the beyond-reference
large-scale pipeline surface (SURVEY §2.11 family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantizable(v: Column) -> Column:
    """True iff ``v`` is non-NULL, non-empty, and every element is a
    finite non-NULL double — the only rows the int8 scheme is defined
    on (module docstring). Non-finite elements are as corrupting as
    NULLs (round-10 review): a NaN element makes scale NaN and forces
    EVERY code to the clamp bound 127 (greatest/least skip NaN the way
    clamp(round(NULL)) resolves to the bound), an Inf element makes
    scale Inf and every finite code 0 — so NaN/Inf vectors quantize to
    NULL like the other degenerate cases instead of writing full-scale
    garbage codes."""
    return (
        v.isNotNull()
        & (F.size(v) > 0)
        & ~F.exists(
            v,
            lambda x: x.isNull()
            | F.isnan(x)
            | (F.abs(x) == F.lit(float("inf"))),
        )
    )


def _scale_expr(v: Column) -> Column:
    """``max_i |v_i| / 127`` (NULL when not quantizable) — ONE shared
    builder so the quantizer, the fidelity report, and their oracles
    cannot drift apart (round-9 review: the expression lived in two
    hand-written copies)."""
    max_abs = F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    return F.when(_quantizable(v), max_abs / F.lit(127.0))


def _code_expr(x: Column, scale: Column) -> Column:
    """clamp(round(x / scale), -127, 127) as double (exact integers)."""
    return F.greatest(
        F.lit(-127.0), F.least(F.lit(127.0), F.round(x / scale, 0))
    )


def quantize_embeddings_int8(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """(id, qvec array<tinyint>, scale double) — one row per input
    vector. A non-empty all-zero vector gets scale 0 and all-zero
    codes; a NULL/empty/NULL-element vector yields NULL qvec and scale
    (see module docstring). Dequantize with ``dequantize_int8``."""
    v = F.col(embedding_col).cast("array<double>")
    staged = df.select(F.col(id_col), v.alias("__v"))
    staged = staged.withColumn("__scale", _scale_expr(F.col("__v")))
    codes = F.when(
        F.col("__scale") == 0.0,
        F.transform("__v", lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        # NULL __scale (un-quantizable row) propagates: round(x/NULL)
        # is NULL and the when-chain yields NULL for the whole array
        F.when(
            F.col("__scale").isNotNull(),
            F.transform(
                "__v", lambda x: _code_expr(x, F.col("__scale")).cast("tinyint")
            ),
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
    pipeline runs before switching its store to int8. Un-quantizable
    rows (NULL/empty/NULL-element) report NULL across all three stats
    — never a fake zero that would green-light corruption.
    max_abs_err is bounded by scale/2 + float noise (asserted in
    tests); everything is rounded for cross-engine hash stability
    (the q92 float-sum contract).

    One lineage, one scan, zero shuffles: the codes are re-derived
    inline through the SAME `_code_expr` builder the quantizer uses
    (integer codes round-trip tinyint exactly, so inline-double and
    stored-tinyint reconstructions are identical) instead of joining
    the quantized frame back on id."""
    v = F.col(embedding_col).cast("array<double>")
    staged = df.select(F.col(id_col), v.alias("__v"))
    staged = staged.withColumn("scale", _scale_expr(F.col("__v")))
    err = F.when(
        F.col("scale") == 0.0, F.transform("__v", lambda x: F.abs(x))
    ).otherwise(
        F.when(
            F.col("scale").isNotNull(),
            F.transform(
                "__v",
                lambda x: F.abs(x - _code_expr(x, F.col("scale")) * F.col("scale")),
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
        F.round(F.when(F.col("__err").isNotNull(), mx), 8).alias("max_abs_err"),
        F.round(F.try_divide(sse, F.size("__err")), 12).alias("mse"),
    )
