"""Sweep-line interval concurrency (operators/sweepline.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.sweepline import (
    daily_peak_concurrency,
    interval_concurrency,
)


def _iv(spark, rows):
    return spark.createDataFrame(rows, "start_ts timestamp, end_ts timestamp")


T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def sec(s):
    return T0 + dt.timedelta(seconds=s)


def test_basic_overlap(spark):
    # [0,10], [5,15], [20,25] -> peak 2 (during [5,10]), then 1
    df = _iv(spark, [(sec(0), sec(10)), (sec(5), sec(15)), (sec(20), sec(25))])
    sweep = interval_concurrency(df)
    assert sweep.agg(F.max("concurrency")).first()[0] == 2
    peaks = daily_peak_concurrency(df).collect()
    assert len(peaks) == 1
    assert peaks[0]["peak"] == 2
    assert peaks[0]["n_starts"] == 3


def test_closed_interval_touching_endpoints_overlap(spark):
    # One ends exactly when the other starts: closed semantics => both
    # open at that instant (start processed before end at the tie).
    df = _iv(spark, [(sec(0), sec(10)), (sec(10), sec(20))])
    assert interval_concurrency(df).agg(F.max("concurrency")).first()[0] == 2


def test_zero_length_interval_counts(spark):
    df = _iv(spark, [(sec(5), sec(5)), (sec(0), sec(10))])
    assert interval_concurrency(df).agg(F.max("concurrency")).first()[0] == 2


def test_carry_across_day_boundary(spark):
    # An interval spanning midnight must carry +1 into the next day's
    # bucket: day 2's peak is 2 even though only one interval STARTS then.
    d1 = dt.datetime(2024, 1, 1, 23, 0, 0)
    d2 = dt.datetime(2024, 1, 2, 1, 0, 0)
    df = _iv(
        spark,
        [
            (d1, d2 + dt.timedelta(hours=3)),  # spans midnight
            (d2, d2 + dt.timedelta(hours=1)),  # inside day 2
        ],
    )
    peaks = {r["bucket"].isoformat(): r["peak"] for r in daily_peak_concurrency(df).collect()}
    assert peaks == {"2024-01-01": 1, "2024-01-02": 2}


def test_matches_global_running_sum_model(spark):
    # Random-ish intervals across 3 days vs a pure-Python sweep model.
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(200):
        s = rng.randrange(0, 3 * 86400)
        rows.append((sec(s), sec(s + rng.randrange(0, 7200))))
    df = _iv(spark, rows)

    events = []
    for s, e in rows:
        events.append((s, -1))  # delta DESC == starts first; model sorts
        events.append((e, +1))  # by (ts, tag) with tag -1 for starts
    events.sort()
    cur, day_peak = 0, {}
    for ts, tag in events:
        cur += 1 if tag == -1 else -1
        d = ts.date().isoformat()
        day_peak[d] = max(day_peak.get(d, 0), cur)
    got = {r["bucket"].isoformat(): r["peak"] for r in daily_peak_concurrency(df).collect()}
    assert got == day_peak


def test_null_endpoint_fails_loud(spark):
    # review finding: NULL endpoints would land in a NULL bucket that
    # sorts first and skews every carry-in — must error, not skew.
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = _iv(spark, [(sec(0), None), (sec(0), sec(5))])
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="close open intervals"):
        interval_concurrency(df).agg(F.max("concurrency")).first()
