"""CDC change-stream application (extension operator, q130).

Reference capability: the reference's sink is ON CONFLICT upsert
(/root/reference/etl/etl.py:467-488) — insert-or-update only. A real
replication/lakehouse feed also carries ordered updates and DELETE
tombstones; applying such a stream to a base snapshot (Delta/Iceberg
``MERGE`` with ``WHEN MATCHED DELETE``, Debezium apply) is the natural
completion of the upsert family (sinks/upsert.py).

Semantics: per key, the change with the highest ``seq_cols`` wins
(include a unique tiebreaker for determinism); if that winner is a
delete, the key disappears; otherwise its row image replaces/creates
the key. Keys never touched by the stream pass through unchanged.

Scale shape: one hash shuffle of the CHANGE stream on the key for the
latest-wins window (changes are the small side in steady state), then
one key-equi anti join against the base and a union — the base is never
windowed or aggregated. This is the same shape as the engine-native
merge (sinks/upsert.py:37), extended with tombstones and ordered
multi-change batches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    *,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
) -> DataFrame:
    """Latest-wins reduction of a change batch: one row per key, the
    change with the highest ``seq_cols`` (compared in order, descending;
    make the last one unique for a deterministic winner)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    *,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply an ordered change stream (upserts + delete tombstones) to a
    base snapshot; returns the post-apply snapshot with ``base``'s
    columns. ``changes`` must carry every base column plus ``op_col``
    and ``seq_cols``."""
    missing = [c for c in base.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing base columns: {missing}")
    # Key columns must be non-null in the CHANGE stream: the equi/anti
    # joins below are null-unsafe, so a NULL-keyed delete would be a
    # silent no-op and a NULL-keyed upsert an appended duplicate
    # (ADVICE r6). Fail fast executor-side instead — same posture as
    # the ValueError guard above, but data-dependent so it has to be a
    # runtime expression. A NULL-keyed BASE row is well-defined and
    # allowed: no change row can address it, so it passes through.
    for c in key_cols:
        changes = changes.withColumn(
            c,
            F.when(
                F.col(c).isNull(),
                F.raise_error(
                    F.lit(
                        f"cdc_apply: NULL key {c!r} in change stream — "
                        "NULL keys cannot match any base row (delete "
                        "would no-op, upsert would duplicate)"
                    )
                ),
            ).otherwise(F.col(c)),
        )
    latest = latest_changes(changes, key_cols=key_cols, seq_cols=seq_cols)
    untouched = base.join(
        latest.select(*key_cols), list(key_cols), "left_anti"
    )
    # null-safe: ONLY an exact tombstone deletes. A NULL/unknown op is
    # an upsert, never a silent delete (op != delete_op would evaluate
    # to NULL for NULL ops and drop the key from both branches).
    upserts = latest.filter(~F.col(op_col).eqNullSafe(delete_op)).select(*base.columns)
    return untouched.unionByName(upserts)
