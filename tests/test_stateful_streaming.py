"""applyInPandasWithState cross-batch dedup: keys seen in an earlier
drain must stay deduplicated in later drains (state store recovery)."""

from __future__ import annotations

import json

import pytest

from usajobs_etl_service_spark.sources.ingest import flatten_postings, parse_api_pages
from usajobs_etl_service_spark.streaming.stateful import streaming_first_wins_dedup

from tests.test_rest_source import make_page
from tests.test_streaming import _write_page


def _drain(spark, spool, ckpt, collected):
    raw = spark.readStream.schema("page long, payload string").json(str(spool))
    flat = flatten_postings(parse_api_pages(raw))
    deduped = streaming_first_wins_dedup(
        flat,
        key_col="position_uri",
        order_col="ingest_seq",
        output_cols=["position_uri", "position_title", "ingest_seq"],
    )

    def sink(df, _bid):
        collected.extend((r["position_uri"], r["position_title"]) for r in df.collect())

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_cross_batch_dedup_with_state(spark, tmp_path):
    spool = tmp_path / "spool"
    ckpt = str(tmp_path / "ckpt")
    out = []

    # batch 1: uris 0..3, with an in-batch dup of uri 1
    page1 = make_page(4, 0, 99)
    dup = {
        "MatchedObjectDescriptor": {
            "PositionTitle": "Shadow Duplicate",
            "PositionURI": page1["SearchResult"]["SearchResultItems"][1]["MatchedObjectDescriptor"][
                "PositionURI"
            ],
        }
    }
    page1["SearchResult"]["SearchResultItems"].append(dup)
    _write_page(spool, 1, page1)
    _drain(spark, spool, ckpt, out)
    uris = [u for u, _ in out]
    assert len(uris) == 4 == len(set(uris))  # in-batch dup dropped
    assert ("https://www.usajobs.gov/job/1", "Data Engineer 1") in out

    # batch 2 (new drain, same checkpoint): uri 1 re-sent with a new
    # title + genuinely new uris 4..5 -> only the new ones emitted
    page2 = make_page(2, 4, 99)
    page2["SearchResult"]["SearchResultItems"].append(
        {
            "MatchedObjectDescriptor": {
                "PositionTitle": "Late Duplicate",
                "PositionURI": "https://www.usajobs.gov/job/1",
            }
        }
    )
    _write_page(spool, 2, page2)
    _drain(spark, spool, ckpt, out)
    assert len(out) == 6
    titles = dict(out)
    assert titles["https://www.usajobs.gov/job/1"] == "Data Engineer 1"  # state held across drains
    assert "https://www.usajobs.gov/job/4" in titles and "https://www.usajobs.gov/job/5" in titles


def test_rate_source_soak_ttl_dedup(spark, tmp_path):
    """Soak the stateful dedup against Spark's rate source: a steady
    stream with keys cycling over a small domain — every key must be
    emitted exactly once across all micro-batches, at rate-source
    volume (bounded run; TTL path exercised via ttl_ms)."""
    from pyspark.sql import functions as F

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .option("numPartitions", "4")
        .load()
        .select(
            F.concat(F.lit("key-"), (F.col("value") % 50).cast("string")).alias("position_uri"),
            F.col("value").alias("ingest_seq"),
        )
    )
    deduped = streaming_first_wins_dedup(
        rate, key_col="position_uri", order_col="ingest_seq", ttl_ms=600_000
    )
    seen = []

    def sink(df, _bid):
        seen.extend((r["position_uri"], r["ingest_seq"]) for r in df.collect())

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 25
    while time.time() < deadline and len({k for k, _ in seen}) < 50:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()

    keys = [k for k, _ in seen]
    assert len(keys) == len(set(keys)), "a key was emitted twice across micro-batches"
    assert len(set(keys)) == 50, f"only {len(set(keys))}/50 keys surfaced before the deadline"
    # first-wins: rate source counts 0,1,2,... so the first-ever seq for
    # key-N is exactly N
    for k, s in seen:
        assert s == int(k.split("-")[1])


@__import__("pytest").mark.slow
def test_rocksdb_soak_curation_gate_plus_dedup(spark, tmp_path):
    """30 s+ soak at a rate that forces many micro-batches AND state
    expiry under RocksDB (VERDICT r4 #5): rate source -> stream-static
    join onto real document text -> the SAME curation gate q69 uses ->
    TTL'd stateful dedup. Keys are unique (the rate counter), so with a
    5 s TTL the store must stay bounded at ~rate x TTL while total
    input grows unbounded — expiry is load-bearing, not decorative.
    Asserts exactly-once emission, streaming/batch gate parity, bounded
    state, and multiple micro-batches; prints the numbers recorded in
    SCALE.md §Streaming."""
    import time

    import pytest
    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.session import read_table
    from usajobs_etl_service_spark.streaming.pipeline import curation_gate

    provider = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, provider)
    RATE, TTL_MS, SOAK_SEC, N_DOCS = 1000, 5_000, 35, 500

    docs = read_table(spark, "/root/testdata/sf0.01", "documents").select("doc_id", "text")
    # batch-side ground truth: which docs pass the shared gate
    passing = {r["doc_id"] for r in curation_gate(docs).select("doc_id").collect()}
    assert 0 < len(passing) < N_DOCS  # the gate must actually gate

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(RATE))
        .option("numPartitions", "4")
        .load()
        .withColumn("doc_id", F.col("value") % N_DOCS)
        .join(docs, "doc_id")  # stream-static equi-join, broadcast
        .select(
            F.col("value").alias("position_uri"),  # unique key per row
            F.col("value").alias("ingest_seq"),
            "doc_id",
            "text",
        )
    )
    gated = curation_gate(rate).select("position_uri", "ingest_seq", "doc_id")
    deduped = streaming_first_wins_dedup(
        gated,
        key_col="position_uri",
        order_col="ingest_seq",
        output_cols=["position_uri", "doc_id"],
        ttl_ms=TTL_MS,
    )
    emitted: list[tuple] = []

    def sink(df, _bid):
        emitted.extend((r["position_uri"], r["doc_id"]) for r in df.collect())

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_soak"))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    state_rows_samples: list[int] = []
    try:
        deadline = time.time() + SOAK_SEC
        while time.time() < deadline:
            time.sleep(1.0)
            p = q.lastProgress
            if p and p.get("stateOperators"):
                state_rows_samples.append(p["stateOperators"][0]["numRowsTotal"])
        final = q.lastProgress
    except Exception as e:  # pragma: no cover — provider missing
        q.stop()
        pytest.skip(f"RocksDB soak unavailable: {e}")
    finally:
        q.stop()
        q.awaitTermination()
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)

    n_batches = final["batchId"] if final else 0
    keys = [k for k, _ in emitted]
    assert len(keys) == len(set(keys)), "a key was emitted twice (exactly-once broken)"
    assert len(keys) > RATE * 5, f"only {len(keys)} rows emitted in {SOAK_SEC}s soak"
    assert n_batches >= 5, f"only {n_batches} micro-batches — not a soak"
    # streaming/batch parity of the shared gate: every emitted row's doc
    # passed the batch gate, and every passing doc eventually surfaced
    assert {d for _, d in emitted} == passing
    # bounded state: unique keys would grow ~RATE*elapsed without
    # expiry; with a 5 s TTL the store must hold roughly RATE*TTL keys.
    # Timeout processing runs per micro-batch, so allow generous slack —
    # the claim is O(rate x ttl), not exact.
    peak = max(state_rows_samples)
    assert peak < len(keys), f"state ({peak}) never expired below total emitted ({len(keys)})"
    assert peak < RATE * (TTL_MS / 1000) * 4, f"state peak {peak} >> rate*ttl bound"
    import pathlib

    ckpt_files = [p for p in pathlib.Path(str(tmp_path / "ckpt_soak")).rglob("*") if p.is_file()]
    assert any(".zip" in p.name or ".sst" in p.name for p in ckpt_files), "no RocksDB artifacts"
    print(
        f"SOAK: {len(keys)} emitted / {n_batches + 1} micro-batches / "
        f"state peak {peak} rows (bound {RATE * TTL_MS // 1000}) / "
        f"passing docs {len(passing)}/{N_DOCS}"
    )


def test_rocksdb_state_store_backend(spark, tmp_path):
    """The 100x-state story: HDFS-backed in-memory state holds every key
    in executor heap; RocksDB spills to local disk. Run the same
    cross-batch dedup with the RocksDB provider and verify (a) results
    are unchanged, (b) the checkpoint actually contains RocksDB state
    artifacts. Skips (documented fallback: default HDFS-backed store)
    if this Spark build lacks the provider."""
    import pytest

    provider = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, provider)
    try:
        spool = tmp_path / "spool_rocks"
        ckpt = str(tmp_path / "ckpt_rocks")
        out = []
        _write_page(spool, 1, make_page(4, 0, 99))
        try:
            _drain(spark, spool, ckpt, out)
        except Exception as e:  # provider missing in this build
            pytest.skip(f"RocksDB state store unavailable: {e}")
        assert len(out) == 4 == len({u for u, _ in out})
        # second drain, same checkpoint: re-sent key must stay deduped
        page2 = make_page(1, 4, 99)
        page2["SearchResult"]["SearchResultItems"].append(
            {
                "MatchedObjectDescriptor": {
                    "PositionTitle": "Late Duplicate",
                    "PositionURI": "https://www.usajobs.gov/job/1",
                }
            }
        )
        _write_page(spool, 2, page2)
        _drain(spark, spool, ckpt, out)
        uris = [u for u, _ in out]
        assert len(uris) == 5 == len(set(uris))
        # RocksDB leaves provider-specific artifacts under state/
        import pathlib

        state_files = [str(p) for p in pathlib.Path(ckpt).rglob("*") if p.is_file()]
        assert any(".zip" in f or "rocksdb" in f.lower() or ".sst" in f for f in state_files), state_files
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_watermark_dedup_drops_within_window_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark wrapper: a duplicate key arriving
    in a later micro-batch but within the watermark is dropped; state
    is event-time-bounded (the unbounded-key-domain posture)."""
    import json as _json

    from usajobs_etl_service_spark.streaming.stateful import streaming_watermark_dedup

    spool = tmp_path / "wspool"
    ckpt = str(tmp_path / "wckpt")
    spool.mkdir()
    out = []

    def drain():
        raw = (
            spark.readStream.schema("k string, ts timestamp, v long")
            .json(str(spool))
        )
        deduped = streaming_watermark_dedup(
            raw, key_cols=["k"], ts_col="ts", watermark="1 hour"
        )

        def sink(df, _bid):
            out.extend((r["k"], r["v"]) for r in df.collect())

        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def write(name, rows):
        with open(spool / name, "w") as f:
            for k, ts, v in rows:
                f.write(_json.dumps({"k": k, "ts": ts, "v": v}) + "\n")

    write("b1.json", [("a", "2024-01-01 10:00:00", 1), ("b", "2024-01-01 10:01:00", 2),
                      ("a", "2024-01-01 10:02:00", 3)])  # in-batch dup of a
    drain()
    assert sorted(out) == [("a", 1), ("b", 2)]

    # batch 2, same checkpoint: 'a' re-sent 10 min later (inside the
    # 1 h watermark window) -> dropped; new key 'c' passes
    write("b2.json", [("a", "2024-01-01 10:10:00", 9), ("c", "2024-01-01 10:11:00", 4)])
    drain()
    assert sorted(out) == [("a", 1), ("b", 2), ("c", 4)]

    with pytest.raises(ValueError, match="key column"):
        streaming_watermark_dedup(
            spark.readStream.schema("k string, ts timestamp, v long").json(str(spool)),
            key_cols=[],
        )


def test_watermark_dedup_spool_bounded_state_evidence(spark, tmp_path):
    """watermark_dedup_spool (the runnable demo of the bounded-state
    claim) must emit every unique (key, window) row while its final
    state holds only the trailing watermark window's keys — measured
    from the state-store operator metrics, not estimated."""
    from datetime import datetime, timedelta, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from usajobs_etl_service_spark.streaming.pipeline import watermark_dedup_spool

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    spool = tmp_path / "spool"
    spool.mkdir()
    n_win, keys_per = 6, 20
    for w in range(n_win):
        ks = [w * keys_per + i for i in range(keys_per)] * 2  # dup within window
        ts = [base + timedelta(seconds=600 * w)] * len(ks)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
                }
            ),
            str(spool / f"b{w:03d}.parquet"),
        )
    out = watermark_dedup_spool(
        spark,
        str(spool),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        key_cols=["k"],
        watermark="10 minutes",
    )
    assert out["rows_emitted"] == n_win * keys_per  # dups dropped, one per key
    assert out["batches"] >= n_win  # file-per-batch cadence engaged
    # bounded: final state is the trailing window or two, never all keys
    assert 0 < out["state_rows_final"] <= 2 * keys_per, out
    assert out["state_rows_peak"] < n_win * keys_per, out
    assert out["state_bytes_final"] > 0


def test_ttl_dedup_stream_matches_batch_contract(spark, tmp_path):
    """round-11: the event-time TTL dedup's emitted set equals the
    batch gaps-and-islands contract (ttl_dedup_batch) on a spool
    replayed file-per-batch — islands that SPLIT across micro-batches
    and duplicates SUPPRESSED across micro-batches both exercised."""
    import datetime as dt

    from usajobs_etl_service_spark.streaming.stateful import (
        streaming_ttl_dedup,
        ttl_dedup_batch,
    )

    base = dt.datetime(2026, 1, 1, 12, 0, 0)

    def row(seq, key, offset_s):
        return (seq, key, base + dt.timedelta(seconds=offset_s))

    # key 1: dup at +10s (suppressed IN batch 1), island split at
    #   +400s (batch 2, gap >= 300 -> NEW island), dup at +450 (batch 2)
    # key 2: first in batch 1, dup in batch 2 at +100 (cross-batch
    #   suppression), new island in batch 3 at +500
    # key 3: exactly-at-TTL gap (+300) -> >= means new island
    rows_b1 = [row(1, 1, 0), row(2, 1, 10), row(3, 2, 0), row(4, 3, 0)]
    rows_b2 = [row(5, 1, 400), row(6, 1, 450), row(7, 2, 100)]
    rows_b3 = [row(8, 2, 500), row(9, 3, 300)]
    schema = "seq long, k long, ts timestamp"
    all_rows = rows_b1 + rows_b2 + rows_b3

    src = tmp_path / "spool"
    src.mkdir()
    for i, chunk in enumerate((rows_b1, rows_b2, rows_b3)):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"f{i}"))

    golden = {
        (r["k"], r["seq"])
        for r in ttl_dedup_batch(
            spark.createDataFrame(all_rows, schema),
            key_cols=["k"],
            ts_col="ts",
            tiebreak_col="seq",
            ttl_seconds=300,
        ).collect()
    }
    # islands by hand: k1 -> seq 1 (0s), seq 5 (400s >= 300 after 10s);
    # k2 -> seq 3 (0s), seq 8 (500 - 100 >= 300); k3 -> seq 4, seq 9 (== TTL)
    assert golden == {(1, 1), (1, 5), (2, 3), (2, 8), (3, 4), (3, 9)}

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    out = streaming_ttl_dedup(
        stream, key_cols=["k"], ts_col="ts", tiebreak_col="seq", ttl_seconds=300
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["k"], r["seq"])
        for r in spark.sql("SELECT k, seq FROM ttl_dedup_stream").collect()
    }
    assert got == golden
