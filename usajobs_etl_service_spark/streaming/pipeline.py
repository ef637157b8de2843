"""Incremental ingest + event-time analytics with Structured Streaming.

The reference runs one batch per day (infrastructure/main.tf:337-384,
Recurrence frequency=Day). The Spark-native incremental shape keeps the
same operators but swaps the driver loop for a stream:

- **source**: the REST spool directory as a file stream — each spooled
  page JSON is an input file; ``Trigger.AvailableNow`` drains whatever
  pages exist and stops (the daily-batch analog with checkpointed
  exactly-once progress, so a crashed run resumes at the unprocessed
  pages instead of re-fetching).
- **transform**: the SAME ``parse_api_pages``/``flatten_postings`` DAG —
  batch and streaming share one code path (Catalyst treats the stream
  as an unbounded relation).
- **sink**: ``foreachBatch`` -> the join-based upsert writer. MERGE is
  not expressible as a streaming sink; foreachBatch gives each
  micro-batch transactional batch semantics (reference upsert parity).
- **late data**: watermarked sliding/tumbling windows over event time
  for the analytics surface (demonstrated on the ``events`` table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from usajobs_etl_service_spark.sources.ingest import flatten_postings, parse_api_pages


def stream_spool(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Streaming DataFrame of flattened postings from a spool directory
    (one JSON file per fetched page)."""
    raw = spark.readStream.schema("page long, payload string").json(spool_dir)
    return flatten_postings(parse_api_pages(raw))


def run_incremental_upsert(
    spark: SparkSession,
    spool_dir: str,
    checkpoint_dir: str,
    apply_batch,
) -> None:
    """Drain the spool once (Trigger.AvailableNow) upserting each
    micro-batch via ``apply_batch(batch_df, batch_id)``; blocks until
    the drain completes. Checkpointing makes re-runs exactly-once per
    page file."""
    stream = stream_spool(spark, spool_dir)
    query = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def watermark_dedup_spool(
    spark: SparkSession,
    spool_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    key_cols: list[str],
    schema: str = "k long, ts timestamp",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 1,
) -> dict:
    """Drain a parquet spool through ``streaming_watermark_dedup``
    (event-time-bounded ``dropDuplicatesWithinWatermark`` state) into a
    parquet sink and return the MEASURED state evidence:
    ``{"rows_emitted", "state_rows_final", "state_rows_peak",
    "state_bytes_final", "batches"}`` from the query's progress
    events. This is the runnable demo of the bounded-state claim: an
    unbounded ``dropDuplicates`` keeps every key EVER in the store,
    while this state holds only the keys inside the trailing watermark
    window — the numbers come from the state-store operator metrics,
    not an estimate. ``max_files_per_trigger=1`` makes each spool file
    its own micro-batch so the watermark advances (and evicts) between
    files, mirroring a long-running deployment's cadence."""
    from usajobs_etl_service_spark.streaming.stateful import (
        streaming_watermark_dedup,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(spool_dir)
    )
    deduped = streaming_watermark_dedup(
        stream, key_cols=key_cols, ts_col=ts_col, watermark=watermark
    )
    query = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    state_rows = []
    state_bytes = []
    batches = 0
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            batches += 1
            state_rows.append(ops[0].get("numRowsTotal", 0))
            state_bytes.append(ops[0].get("memoryUsedBytes", 0))
    return {
        "rows_emitted": spark.read.parquet(out_dir).count(),
        "state_rows_final": state_rows[-1] if state_rows else 0,
        "state_rows_peak": max(state_rows) if state_rows else 0,
        "state_bytes_final": state_bytes[-1] if state_bytes else 0,
        "batches": batches,
    }


def curation_gate(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_quality: float = 0.5,
) -> DataFrame:
    """Quality + language-id + repetition gate as ONE stateless
    composition — every expression is row-local, so the same gate slots
    into a batch plan (q69's corpus pipeline) or a streaming plan ahead
    of the stateful cross-batch dedup. The repetition verdict runs
    behind ``barrier_filter`` (plans/barrier.py) in both modes: its
    nondeterministic gate is streaming-legal, unlike
    ``monotonically_increasing_id``. Adds ``lang_pred`` and ``quality``
    columns; drops rows failing any gate."""
    from usajobs_etl_service_spark.functions import text as TX
    from usajobs_etl_service_spark.functions.text import tokens_ws
    from usajobs_etl_service_spark.operators.repetition import repetition_keep_tokens
    from usajobs_etl_service_spark.plans.barrier import barrier_filter
    from usajobs_etl_service_spark.plans.spread import spread_for_compute

    # Scale-adaptive on-ramp: the gate is pure per-row CPU (regex
    # features, token folds), so a small single-split input would pin
    # the whole stage on one core; at scale the scan is already wide
    # and this is a no-op (streaming frames pass through untouched).
    docs = spread_for_compute(docs)
    gated = (
        docs.withColumn("lang_pred", TX.lang_id(F.col(text_col)))
        .withColumn("quality", TX.quality_score(F.col(text_col)))
        .filter((F.col("quality") >= min_quality) & (F.col("lang_pred") != "und"))
        .withColumn("__rt", tokens_ws(F.lower(F.col(text_col))))
    )
    return barrier_filter(gated, repetition_keep_tokens(F.col("__rt"))).drop("__rt")


def windowed_event_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked event-time windowed counts per event_type. Works on
    both a static events DataFrame and a stream (same plan); on a
    stream the watermark bounds state and admits late rows up to its
    horizon."""
    windowed = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        windowed.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) per user — the stateful-op demo.
    ``F.session_window`` keeps state per open session; the watermark
    closes sessions whose gap has passed."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    sw = F.session_window(F.col(ts_col), gap)
    return (
        src.groupBy(sw.alias("s"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            user_col,
            "n_events",
            "sum_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each left event with
    right events for the same key whose timestamp falls in
    ``[left_ts, left_ts + max_delay]`` (e.g. click -> purchase
    attribution). Both sides carry watermarks and the join condition
    time-bounds the buffered state, so Spark can evict rows older than
    watermark + delay instead of buffering the streams forever. Works
    identically on batch frames (watermarks are no-ops there), which is
    how the tests pin result parity batch-vs-stream."""
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (l[key_col] == r[key_col])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner").select(
        l[key_col].alias(key_col), F.col(left_ts), F.col(right_ts)
    )


class StreamHealthListener:
    """StreamingQueryListener surfacing per-batch health into the
    structured log: input rows, processed rows/s, watermark, and —
    the number the pipeline must alarm on — rows dropped as too late
    (``stateOperators[].numRowsDroppedByWatermark``). Attach once per
    session: ``listener = attach_stream_health_listener(spark)``;
    totals accumulate on the instance for test/inspection."""

    def __new__(cls, logger=None):
        from pyspark.sql.streaming import StreamingQueryListener

        class _Impl(StreamingQueryListener):
            def __init__(self, logger=None):
                from usajobs_etl_service_spark.observability import get_structured_logger

                self.logger = logger or get_structured_logger("stream_health")
                self.total_input_rows = 0
                self.total_dropped_late = 0
                self.progress_events = 0

            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                dropped = sum(
                    (op.numRowsDroppedByWatermark or 0) for op in (p.stateOperators or [])
                )
                self.progress_events += 1
                self.total_input_rows += int(p.numInputRows or 0)
                self.total_dropped_late += int(dropped)
                import json as _json

                self.logger.info(
                    "stream_progress %s",
                    _json.dumps(
                        {
                            "query_id": str(p.id),
                            "batch_id": p.batchId,
                            "input_rows": int(p.numInputRows or 0),
                            "rows_per_sec": float(p.processedRowsPerSecond or 0.0),
                            "dropped_late_rows": int(dropped),
                        }
                    ),
                )

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        return _Impl(logger)


def attach_stream_health_listener(spark: SparkSession, logger=None):
    """Create + register a StreamHealthListener; returns it (caller may
    ``spark.streams.removeListener(listener)`` when done)."""
    listener = StreamHealthListener(logger)
    spark.streams.addListener(listener)
    return listener
