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


def streaming_watermark_dedup(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Cross-batch dedup with EVENT-TIME-bounded state — the built-in
    ``dropDuplicatesWithinWatermark`` (Spark 3.5+), complementing
    :func:`streaming_first_wins_dedup`:

    - first_wins (applyInPandasWithState): exact first-ever-by-seq
      semantics, state = one boolean per key FOREVER unless a
      processing-time TTL is set — the right tool when re-sends can
      arrive arbitrarily late and the key domain is bounded.
    - this wrapper: state expires by EVENT TIME — a duplicate arriving
      within ``watermark`` of the first sighting is dropped, older
      re-sends pass through as new rows; state size is bounded by the
      keys seen per watermark window, which is what an unbounded key
      domain (URLs, event ids) needs at 100 TB/day. All engine-side
      (RocksDB-checkpointable state store), no Python in the loop.

    Returns the deduplicated stream; ``df`` must be a streaming
    DataFrame with an event-time column ``ts_col``.
    """
    if not key_cols:
        raise ValueError("streaming_watermark_dedup: need at least one key column")
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def streaming_heavy_hitter_candidates(
    df: DataFrame,
    *,
    item_col: str = "item",
    k: int = 100,
    n_buckets: int = 8,
) -> DataFrame:
    """Streaming Misra-Gries: maintain a bounded candidate summary per
    hash bucket across micro-batches (the streaming face of
    operators/heavyhitters.py — same mergeable reduction, same
    guarantee transported to state).

    Items route to ``n_buckets`` stable hash buckets; each bucket's
    state is its MG summary (<= k items + lower-bound counts). A bucket
    re-emits its CURRENT summary whenever a batch touches it, so the
    consumer keeps the LATEST emission PER BUCKET (update-mode
    semantics) — the union of those is the up-to-date candidate set. An item
    absent from its bucket's summary has true stream count
    <= n_bucket/(k+1) <= N/(k+1): candidates are a superset of every
    item with frequency > 1/(k+1), at O(k * n_buckets) total state —
    the exact verify (batch side) stays a bounded semi-join.
    """
    from pyspark.sql import functions as F

    timeout = GroupStateTimeout.NoTimeout

    def summarize(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts = state.get
            counters = dict(zip(items, counts))
        else:
            counters = {}
        from usajobs_etl_service_spark.operators.heavyhitters import mg_merge_reduce

        for pdf in pdfs:
            counters = mg_merge_reduce(counters, pdf[item_col].value_counts(), k)
        state.update((list(counters.keys()), [int(v) for v in counters.values()]))
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(counters),
                "item": list(counters.keys()),
                "lower_count": [int(v) for v in counters.values()],
            }
        )

    bucketed = df.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col(item_col).alias(item_col),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        summarize,
        outputStructType="bucket int, item string, lower_count long",
        stateStructType="items array<string>, counts array<long>",
        outputMode="update",
        timeoutConf=timeout,
    )


def ttl_dedup_batch(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str,
    ttl_seconds: int,
) -> DataFrame:
    """BATCH-EQUIVALENT contract of the TTL'd streaming dedup — the
    queryable artifact (round-10 VERDICT #6) a SQL oracle can check
    with the q42 gaps-and-islands pattern.

    Semantics: per key, arrivals are ordered by ``(ts, tiebreak)`` and
    a row is EMITTED iff it starts a new island — no prior arrival
    within ``ttl_seconds`` of it. This is exactly the state lifecycle
    of a TTL that REFRESHES on every arrival (suppressed duplicates
    extend the timeout, as both streaming variants do): islands split
    where consecutive-arrival gaps reach the TTL, and the island start
    is the one emitted row. Gap comparison is ``>=`` on the exact
    day-time interval (timestamp subtraction is integer microseconds
    underneath in both engines, and works for TIMESTAMP and
    TIMESTAMP_NTZ alike — the q42 boundary convention).

    One per-key window (hash partition on the key, the q42 shape —
    per-key cardinality is event-stream bounded); NULL keys/timestamps
    are excluded (no arrival order is defined for them)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not key_cols:
        raise ValueError("ttl_dedup_batch: need at least one key column")
    clean = df.filter(
        F.col(ts_col).isNotNull()
        & F.lit(True)
        & F.expr(" AND ".join(f"{k} IS NOT NULL" for k in key_cols))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev = F.lag(F.col(ts_col)).over(w)
    return (
        clean.withColumn("__prev_ts", prev)
        .filter(
            F.col("__prev_ts").isNull()
            | (
                F.col(ts_col) - F.col("__prev_ts")
                >= F.expr(f"INTERVAL {int(ttl_seconds)} SECONDS")
            )
        )
        .drop("__prev_ts")
    )


def streaming_ttl_dedup(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str,
    ttl_seconds: int,
    output_cols: list[str] | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """EVENT-TIME TTL dedup: the streaming twin of
    :func:`ttl_dedup_batch`, with state that the watermark provably
    bounds. Emits each key's island-start rows; every arrival
    (emitted or suppressed) refreshes the key's ``last_seen``
    timestamp, and the state times out at ``last_seen + ttl`` — an
    eviction that is semantically a NO-OP (any later in-order row is
    >= ttl past ``last_seen`` and would start a new island anyway),
    which is what makes the emitted set identical to the batch
    contract REGARDLESS of micro-batch boundaries. State per key is
    one long (vs the processing-time variant's per-key boolean that
    only a wall-clock TTL can evict).

    In-order contract: arrivals later than the watermark (late rows
    delivered after their key's state was evicted) re-emit — the
    inherent trade of ANY TTL'd dedup with bounded state; replay
    spools in event-time order (the availableNow file-per-batch
    cadence) to stay exact."""
    from pyspark.sql import functions as F

    if not key_cols:
        raise ValueError("streaming_ttl_dedup: need at least one key column")
    output_cols = output_cols or list(dict.fromkeys([*key_cols, ts_col, tiebreak_col]))
    out_schema = df.select(*output_cols).schema
    ttl_us = int(ttl_seconds) * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_us = state.get[0] if state.exists else None
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        batch = pd.concat(parts, ignore_index=True)
        batch = batch.sort_values([ts_col, tiebreak_col], kind="mergesort")
        ts_us = batch[ts_col].astype("int64") // 1000
        emit_mask = []
        for t in ts_us:
            is_start = last_us is None or t - last_us >= ttl_us
            emit_mask.append(is_start)
            last_us = t  # EVERY arrival refreshes the TTL
        state.update((int(last_us),))
        # evict once the watermark passes last_seen + ttl (no-op
        # semantically; must stay strictly above the current watermark)
        timeout_ms = max(
            int(last_us) // 1000 + int(ttl_seconds) * 1000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)
        emitted = batch.loc[emit_mask, output_cols]
        if len(emitted):
            yield emitted

    return (
        df.withWatermark(ts_col, watermark)
        .select(*dict.fromkeys([*key_cols, ts_col, tiebreak_col, *output_cols]))
        .groupBy(*key_cols)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="last_us long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
