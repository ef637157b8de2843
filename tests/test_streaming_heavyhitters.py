"""Streaming Misra-Gries candidates (streaming/stateful.py) vs the
batch exact heavy hitters over the same data."""

from __future__ import annotations

from collections import Counter

from usajobs_etl_service_spark.streaming.stateful import streaming_heavy_hitter_candidates


def _write_batch(spool, name, items):
    spool.mkdir(parents=True, exist_ok=True)
    (spool / f"{name}.jsonl").write_text(
        "\n".join('{"item": "%s"}' % it for it in items)
    )


def _drain(spark, spool, ckpt, per_batch):
    raw = spark.readStream.schema("item string").json(str(spool))
    cands = streaming_heavy_hitter_candidates(raw, item_col="item", k=20, n_buckets=4)

    def sink(df, bid):
        rows = df.collect()
        if rows:
            per_batch.append(
                {
                    "by_bucket": {
                        b: {r["item"]: r["lower_count"] for r in rows if r["bucket"] == b}
                        for b in {r["bucket"] for r in rows}
                    }
                }
            )

    q = (
        cands.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_candidates_cover_heavy_items_across_batches(spark, tmp_path):
    spool = tmp_path / "spool"
    ckpt = str(tmp_path / "ckpt")

    # the needle is spread across three micro-batches, below any single
    # batch's top items; noise is wide
    b1 = ["needle"] * 30 + [f"n1_{i}" for i in range(150)]
    b2 = ["needle"] * 40 + [f"n2_{i}" for i in range(150)]
    b3 = ["needle"] * 30 + ["second"] * 60 + [f"n3_{i}" for i in range(100)]

    per_batch: list[dict] = []
    _write_batch(spool, "b1", b1)
    _drain(spark, spool, ckpt, per_batch)
    _write_batch(spool, "b2", b2)
    _drain(spark, spool, ckpt, per_batch)
    _write_batch(spool, "b3", b3)
    _drain(spark, spool, ckpt, per_batch)

    # update-mode consumer: latest emission per bucket, then union
    latest = {}
    for batch in per_batch:
        latest.update(batch["by_bucket"])
    final = {it: lb for summary in latest.values() for it, lb in summary.items()}
    all_items = b1 + b2 + b3
    n = len(all_items)
    k = 20
    exact = Counter(all_items)
    for item, cnt in exact.items():
        if cnt > n / (k + 1):
            assert item in final, f"heavy item {item} (cnt={cnt}) missing"
    # lower bounds never exceed true counts
    for item, lb in final.items():
        assert lb <= exact[item]
    assert "needle" in final and "second" in final


def test_state_survives_restart_and_stays_bounded(spark, tmp_path):
    spool = tmp_path / "spool"
    ckpt = str(tmp_path / "ckpt")
    per_batch: list[dict] = []

    _write_batch(spool, "b1", ["hot"] * 50 + [f"x{i}" for i in range(200)])
    _drain(spark, spool, ckpt, per_batch)
    # new drain = new query restart from the checkpointed state store
    _write_batch(spool, "b2", ["hot"] * 50 + [f"y{i}" for i in range(200)])
    _drain(spark, spool, ckpt, per_batch)

    latest = {}
    for batch in per_batch:
        latest.update(batch["by_bucket"])
    final = {it: lb for summary in latest.values() for it, lb in summary.items()}
    assert "hot" in final
    assert final["hot"] <= 100
    # state bound: <= k candidates per bucket
    assert len(final) <= 20 * 4
