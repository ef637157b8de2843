"""Vector math over ``array<float/double>`` columns — pure built-in
higher-order functions (JVM-side; no Python on the hot path).

Used by the similarity-search and embedding-dedup operators
(SURVEY.md §2.11)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL/zero-norm -> NULL (via try_divide)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize. The naive ``transform(a, x -> x / norm(a))``
    re-evaluates the O(dim) norm fold inside the per-element lambda —
    O(dim^2) interpreted work per evaluation (half of round-7's q157
    32 s). ``array_repeat`` evaluates the norm ONCE per row and
    ``zip_with`` divides element-wise: O(dim), bit-identical values
    (same division, same operand order)."""
    return F.zip_with(
        a,
        F.array_repeat(norm(a), F.size(a)),
        lambda x, n: F.try_divide(x, n),
    )


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
