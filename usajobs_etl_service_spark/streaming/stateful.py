"""Custom stateful streaming operator: cross-batch first-wins dedup via
``applyInPandasWithState``.

The batch engine's A6 dedup is per-run; on a stream, "have I seen this
key before" must survive across micro-batches. State here is one
boolean per key in the state store (checkpointed, recovered on
restart): the first row for a key is emitted, every later arrival — in
the same micro-batch or any future one — is dropped.

Scale notes: state is partitioned by the grouping key across
executors; a TTL (``GroupStateTimeout.ProcessingTimeTimeout`` +
``state.setTimeoutDuration``) bounds the store for unbounded key
domains — enabled via ``ttl_ms``. Without a TTL the store grows with
|distinct keys| (exactly like the batch dedup's shuffle side)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_wins_dedup(
    df: DataFrame,
    *,
    key_col: str = "position_uri",
    order_col: str = "ingest_seq",
    output_cols: list[str] | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit the first-ever row per key across all micro-batches.

    ``df`` must be a streaming DataFrame containing ``key_col``,
    ``order_col``, and ``output_cols`` (defaults to key+order)."""
    output_cols = output_cols or [key_col, order_col]
    out_schema = df.select(*output_cols).schema
    timeout = GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout

    def dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already_seen = state.exists
        if not already_seen:
            first_row = None
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                candidate = pdf.sort_values(order_col).iloc[[0]]
                if first_row is None or candidate[order_col].iloc[0] < first_row[order_col].iloc[0]:
                    first_row = candidate
            if first_row is not None:
                state.update((True,))
                if ttl_ms:
                    state.setTimeoutDuration(ttl_ms)
                yield first_row[output_cols]
        else:
            for _ in pdfs:  # drain the iterator; nothing to emit
                pass
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)

    return (
        df.select(*dict.fromkeys([key_col, order_col, *output_cols]))
        .groupBy(key_col)
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=out_schema,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=timeout,
        )
    )
