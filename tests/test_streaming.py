"""Structured Streaming: incremental spool drain with exactly-once
checkpointing, windowed counts, session windows."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from usajobs_etl_service_spark.session import read_table
from usajobs_etl_service_spark.sinks.upsert import merge_upsert
from usajobs_etl_service_spark.streaming.pipeline import (
    run_incremental_upsert,
    sessionize,
    stream_spool,
    windowed_event_counts,
)

from tests.test_rest_source import make_page


def _write_page(spool, page_no, payload):
    spool.mkdir(exist_ok=True)
    (spool / f"page-{page_no:05d}.json").write_text(
        json.dumps({"page": page_no, "payload": json.dumps(payload)})
    )


def test_incremental_drain_and_resume(spark, tmp_path):
    spool = tmp_path / "spool"
    ckpt = str(tmp_path / "ckpt")
    out = {"batches": [], "rows": 0}

    def apply_batch(df, batch_id):
        out["batches"].append(batch_id)
        out["rows"] += df.count()

    _write_page(spool, 1, make_page(4, 0, 8))
    _write_page(spool, 2, make_page(4, 4, 8))
    run_incremental_upsert(spark, str(spool), ckpt, apply_batch)
    assert out["rows"] == 8

    # new page arrives; re-run drains ONLY the new file (checkpoint)
    _write_page(spool, 3, make_page(2, 8, 10))
    run_incremental_upsert(spark, str(spool), ckpt, apply_batch)
    assert out["rows"] == 10  # 8 + 2, pages 1-2 not reprocessed


def test_streaming_and_batch_share_plan(spark, tmp_path):
    spool = tmp_path / "spool"
    _write_page(spool, 1, make_page(3, 0, 3))
    sdf = stream_spool(spark, str(spool))
    assert sdf.isStreaming
    assert "position_uri" in sdf.columns and "ingest_seq" in sdf.columns


def test_foreachbatch_upsert_integration(spark, tmp_path):
    """Stream pages into a parquet table through the merge writer."""
    import os

    spool = tmp_path / "spool"
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "table")

    def apply_batch(df, batch_id):
        from usajobs_etl_service_spark.schemas import JOB_POSTING_SCHEMA

        batch = df.drop("ingest_seq").withColumn("created_at", F.current_timestamp()).withColumn(
            "updated_at", F.current_timestamp()
        )
        if os.path.isdir(table) and any(f.endswith(".parquet") for f in os.listdir(table)):
            base = spark.read.parquet(table)
        else:
            base = spark.createDataFrame([], JOB_POSTING_SCHEMA)
        merged = merge_upsert(base, batch, ["position_uri"])
        merged.write.mode("overwrite").parquet(table + ".tmp")
        spark.read.parquet(table + ".tmp").write.mode("overwrite").parquet(table)

    _write_page(spool, 1, make_page(5, 0, 5))
    run_incremental_upsert(spark, str(spool), ckpt, apply_batch)
    assert spark.read.parquet(table).count() == 5


def test_windowed_counts_on_events(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    out = windowed_event_counts(events, window_duration="1 day")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    # every window boundary is aligned to the day
    assert all(r["window_start"].hour == 0 for r in rows)


def test_sessionize_on_events(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    out = sessionize(events, gap="30 minutes")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join drained with availableNow must
    produce exactly the batch join's pairs."""
    import datetime

    from usajobs_etl_service_spark.streaming.pipeline import interval_join_streams

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    clicks = [(u, ts(m)) for u, m in [(1, 0), (1, 30), (2, 5), (3, 10)]]
    buys = [(u, ts(m)) for u, m in [(1, 4), (1, 33), (2, 40), (3, 10), (3, 21)]]
    # expected: click matches buys within [click, click+10min]
    # u1: (0,4), (30,33); u2: none (40 > 5+10); u3: (10,10); (10,21) too late

    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    spark.createDataFrame(clicks, "user_id long, l_ts timestamp").write.parquet(cdir)
    spark.createDataFrame(buys, "user_id long, r_ts timestamp").write.parquet(bdir)

    cs = spark.readStream.schema("user_id long, l_ts timestamp").parquet(cdir)
    bs = spark.readStream.schema("user_id long, r_ts timestamp").parquet(bdir)
    joined = interval_join_streams(cs, bs)

    got = []

    def sink(df, _bid):
        got.extend((r["user_id"], r["l_ts"], r["r_ts"]) for r in df.collect())

    q = (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = interval_join_streams(
        spark.read.parquet(cdir), spark.read.parquet(bdir)
    ).collect()
    want = {(r["user_id"], r["l_ts"], r["r_ts"]) for r in batch}
    assert set(got) == want
    assert want == {
        (1, ts(0), ts(4)),
        (1, ts(30), ts(33)),
        (3, ts(10), ts(10)),
    }


def test_curation_gate_then_stateful_dedup_matches_batch(spark, tmp_path):
    """The streaming curation path: the SAME stateless quality/lang/
    repetition gate the batch corpus pipeline runs (curation_gate),
    composed ahead of the cross-batch stateful dedup, drained file-by-
    file with Trigger.AvailableNow. Golden = the batch gate + first-wins
    dedup over the identical rows, so batch/stream curation stay
    symmetric by construction."""
    from usajobs_etl_service_spark.operators.dedup import dedup_first_wins
    from usajobs_etl_service_spark.streaming.pipeline import curation_gate
    from usajobs_etl_service_spark.streaming.stateful import streaming_first_wins_dedup

    good = (
        "the quick brown fox and the lazy dog walk in the park with "
        "their friends on a sunny day in the old town by the river"
    )
    spam = " ".join(["buy"] * 40)
    junk = "9999 8888 7777 6666 !!!! ???? @@@@ 5555 4444 3333"
    texts = [good, spam, junk]
    rows = [
        (seq, seq % 5, f"{texts[seq % 3]} variant {seq}")
        for seq in range(30)
    ]
    schema = "ingest_seq long, doc_key long, text string"

    # three files -> three micro-batches (maxFilesPerTrigger=1), ordered
    # so the first arrival per key is also the min ingest_seq
    src = tmp_path / "docs"
    src.mkdir()
    batch_df = spark.createDataFrame(rows, schema)
    for i in range(3):
        part = spark.createDataFrame(rows[i * 10 : (i + 1) * 10], schema)
        part.coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))

    golden = {
        (r["doc_key"], r["ingest_seq"])
        for r in dedup_first_wins(curation_gate(batch_df), ["doc_key"], "ingest_seq").select(
            "doc_key", "ingest_seq"
        ).collect()
    }
    assert 0 < len(golden) <= 5  # the gate really rejects spam/junk rows

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    deduped = streaming_first_wins_dedup(
        curation_gate(stream), key_col="doc_key", order_col="ingest_seq"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["doc_key"], r["ingest_seq"])
        for r in spark.sql("select doc_key, ingest_seq from curated_stream").collect()
    }
    assert got == golden


def test_stream_health_listener_counts_late_drops(spark, tmp_path):
    """The listener must report numRowsDroppedByWatermark: feed a
    watermarked aggregation two availableNow drains where the second
    delivers an event far behind the advanced watermark."""
    import datetime
    import time as _time

    from usajobs_etl_service_spark.streaming.pipeline import (
        attach_stream_health_listener,
        windowed_event_counts,
    )

    src = tmp_path / "events_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    listener = attach_stream_health_listener(spark)
    try:
        schema = "event_id long, user_id long, event_type string, value double, ts timestamp"
        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

        def drain(rows, tag):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
                str(src / tag)
            )
            stream = spark.readStream.schema(schema).parquet(str(src / tag))
            agg = windowed_event_counts(stream, window_duration="10 minutes", watermark="5 minutes")
            q = (
                agg.writeStream.format("noop")
                .option("checkpointLocation", ckpt + tag)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # batch 1 advances the watermark to ~12:55
        drain(
            [(i, 1, "click", 1.0, t0 + datetime.timedelta(minutes=60 + i)) for i in range(3)],
            "a",
        )
        before = listener.total_dropped_late
        # batch 2 (same checkpoint lineage tag "a" continues the watermark):
        # one fresh event + one event hours behind -> dropped
        drain(
            [
                (10, 1, "click", 1.0, t0 + datetime.timedelta(minutes=70)),
                (11, 1, "click", 1.0, t0 - datetime.timedelta(hours=5)),
            ],
            "a",
        )
        deadline = _time.time() + 10
        while _time.time() < deadline and listener.total_dropped_late == before:
            _time.sleep(0.2)
        assert listener.progress_events > 0
        assert listener.total_input_rows >= 5
        assert listener.total_dropped_late >= before + 1
    finally:
        spark.streams.removeListener(listener)
