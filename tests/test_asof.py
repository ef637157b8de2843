"""As-of join: correctness against hand-computed expectations and a
single-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(10), "b"), (1, _ts(2), "c"), (2, _ts(7), "d"), (3, _ts(1), "e")],
        "k long, ts timestamp, payload string",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 30.0), (1, _ts(10), 100.0), (2, _ts(6), 60.0)],
        "k long, rts timestamp, price double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")
    got = {r["payload"]: (r["price_asof"], r["rts_asof"]) for r in out.collect()}
    assert got["a"] == (30.0, _ts(3))  # latest right <= 00:05
    assert got["b"] == (100.0, _ts(10))  # tie matches (rts == ts)
    assert got["c"] == (None, None)  # nothing before 00:02
    assert got["d"] == (60.0, _ts(6))
    assert got["e"] == (None, None)  # key with no right rows
    assert out.count() == left.count()  # left-preserving


def test_asof_max_lookback(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        max_lookback=F.expr("INTERVAL 1 MINUTE"),
    )
    got = {r["payload"]: r["price_asof"] for r in out.collect()}
    assert got["a"] is None  # 00:03 is 2 min before 00:05 -> stale
    assert got["b"] == 100.0  # exact-time match stays
    assert got["d"] == 60.0  # 1 min back -> fresh


def test_asof_single_shuffle(spark):
    left, right = _frames(spark)
    p = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")._jdf.queryExecution().executedPlan().toString()
    # union + one window: exactly one hash-partition exchange, no join node
    assert p.count("Exchange") == 1
    assert "Join" not in p


def test_asof_row_atomic_carry_with_null_fields(spark):
    """Fuzz-sweep regression: a NEWER right row with a NULL value must
    win AS A ROW — the old per-column last(ignorenulls) carry stitched
    the older row's value onto the newer row's timestamp."""
    left = spark.createDataFrame([(1, _ts(20), "x")], "k long, ts timestamp, payload string")
    right = spark.createDataFrame(
        [(1, _ts(3), 30.0), (1, _ts(10), None)],
        "k long, rts timestamp, price double",
    )
    row = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").first()
    assert row["rts_asof"] == _ts(10)
    assert row["price_asof"] is None  # the matched ROW's value, not a mix


def test_asof_equal_ts_ties_pick_greatest_value(spark):
    """Fuzz-sweep regression: duplicate right rows on (key, ts) resolve
    deterministically to the greatest value (NULL last) — replayable in
    SQL as ORDER BY value DESC NULLS LAST."""
    left = spark.createDataFrame([(1, _ts(10), "x")], "k long, ts timestamp, payload string")
    right = spark.createDataFrame(
        [(1, _ts(10), None), (1, _ts(10), 5.0), (1, _ts(10), 9.0)],
        "k long, rts timestamp, price double",
    )
    row = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").first()
    assert row["price_asof"] == 9.0
