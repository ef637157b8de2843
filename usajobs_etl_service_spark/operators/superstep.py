"""Parquet-superstep round-trip helper for the iterative graph family
(connected components, k-core, k-hop BFS, label propagation, SSSP).

Two per-round costs the loops all shared, removed here (optimization
round 12, guide §1.2 — don't run a second job for what the first
already knows):

- the convergence signal (count / count+sum / count+hash fingerprint)
  was a SECOND job re-reading the just-written tiny parquet; it is now
  OBSERVED during the materializing write itself (``Dataset.observe``
  / ``CollectMetrics`` — computed on exactly the written rows, zero
  extra passes);
- the read-back re-inferred the parquet schema through the JVM footer
  reader (~0.1 s of driver time per round); the schema is the written
  frame's own, so it is passed explicitly.

The parquet materialization itself stays exactly as clustering.py:134
argues: one-round-deep lineage, executor-loss-safe where
localCheckpoint is not (measured a wall-clock tie with localCheckpoint
on the q199 BFS shape, so the safer form wins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation


def write_read(
    df: DataFrame, path: str, metrics: Sequence[Column] | None = None
) -> tuple[DataFrame, dict | None]:
    """Materialize ``df`` to ``path`` and return the parquet-backed
    frame plus the observed ``metrics`` row (a dict, or None when no
    metrics were requested). The metrics are aggregate expressions
    over the written rows, collected by the write job itself.

    INVARIANT (fixpoint correctness — ADVICE r12): the CollectMetrics
    node is placed IMMEDIATELY on top of the written plan, i.e. in the
    write's own result stage, where Spark's exactly-once accumulator
    semantics for the final stage hold. Callers must NOT add
    transformations between this observe and the write (there is no
    seam here to do so — keep it that way): an observe evaluated below
    a shuffle boundary can double/under-count under task retry, and a
    skewed convergence signal silently stops a superstep loop at the
    wrong fixpoint — the failure mode clustering.py's fingerprint
    comment warns about."""
    spark = df.sparkSession
    obs = None
    if metrics:
        obs = Observation()
        df = df.observe(obs, *metrics)
    df.write.mode("overwrite").parquet(path)
    back = spark.read.schema(df.schema).parquet(path)
    return back, (obs.get if obs is not None else None)
