"""Optimizer barrier for expensive filter predicates.

Heavy higher-order-function expressions (array folds, gram pipelines)
must never sit in a Filter: Catalyst collapses the defining projection
into the Filter condition, the Filter node drops out of whole-stage
codegen (no ``*`` in the formatted plan), and on the interpreted path
shared subtrees re-evaluate once per reference — measured ~40x slower
than the identical expressions as projected columns, and worse still
when pushdown carries the condition into the parquet scan's
``DataFilters``.

``barrier_filter`` computes the condition ONCE as a projected column
(codegen + common-subexpression elimination apply), then filters
through ``first()`` over a per-key window — a filter on a window output
can never be substituted back into the projection, and the window adds
only a hash shuffle on the key (which downstream keyed operations
usually need anyway). Costly only when nothing downstream shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def barrier_filter(df: DataFrame, cond: Column, key: str) -> DataFrame:
    """``df.filter(cond)`` with ``cond`` guaranteed to evaluate exactly
    once per row in projection position. ``key`` spreads the barrier
    window's shuffle (any column works — rows are only grouped with
    equal condition values, so the gate is exact even for duplicate
    keys: ``first()`` over (key, cond) is the row's own cond)."""
    w = Window.partitionBy(key, "__barrier_cond")
    return (
        df.withColumn("__barrier_cond", cond)
        .withColumn("__barrier_gate", F.first("__barrier_cond").over(w))
        .filter(F.col("__barrier_gate"))
        .drop("__barrier_cond", "__barrier_gate")
    )
