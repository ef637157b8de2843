"""km_curve vs a pure-Python Kaplan-Meier reference."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from usajobs_etl_service_spark.operators.survival import km_curve

D0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(lifetimes):
    """lifetimes: list of (user_id, first_day, last_day) -> event rows."""
    rows = []
    for uid, f, l in lifetimes:
        rows.append((uid, D0 + dt.timedelta(days=f)))
        rows.append((uid, D0 + dt.timedelta(days=l)))
    return rows


def _km_py(lifetimes, horizon):
    end = max(l for _, _, l in lifetimes)
    subjects = [(l - f, 1 if l < end - horizon else 0) for _, f, l in lifetimes]
    n = len(subjects)
    durations = sorted({d for d, _ in subjects})
    out = []
    s = 1.0
    seen = 0
    dead = False
    for t in durations:
        at_risk = n - seen
        d = sum(1 for dd, c in subjects if dd == t and c == 1)
        total = sum(1 for dd, _ in subjects if dd == t)
        if d >= at_risk:
            dead = True
        elif d > 0:
            s = math.exp(math.log(s) + math.log((at_risk - d) / at_risk)) if s > 0 else 0.0
        if d > 0:
            out.append((t, at_risk, d, total - d, 0.0 if dead else round(s, 6)))
        seen += total
    return out


def _run(spark, lifetimes, horizon=3):
    df = spark.createDataFrame(_events(lifetimes), "user_id long, ts timestamp")
    rows = km_curve(df, "user_id", "ts", churn_horizon_days=horizon).collect()
    return [
        (r.duration_days, r.n_at_risk, r.n_events, r.n_censored, r.survival)
        for r in rows
    ]


def test_textbook_example(spark):
    # classic: churns at 1, 3, 3, censored at 2 and 5 (horizon keeps
    # the late users alive)
    lifetimes = [
        (1, 0, 1),
        (2, 0, 3),
        (3, 0, 3),
        (4, 0, 8),  # last seen at stream end: censored
        (5, 0, 9),  # defines stream end: censored
        (6, 0, 2),
    ]
    got = _run(spark, lifetimes)
    # manual: t=1: risk 6, d 1 -> 5/6; t=2: risk 5, d 1 -> 5/6*4/5
    # t=3: risk 4, d 2 -> *2/4
    assert [(r[0], r[1], r[2]) for r in got] == [(1, 6, 1), (2, 5, 1), (3, 4, 2)]
    assert got[0][4] == pytest.approx(5 / 6, abs=1e-6)
    assert got[1][4] == pytest.approx(5 / 6 * 4 / 5, abs=1e-6)
    assert got[2][4] == pytest.approx(5 / 6 * 4 / 5 * 2 / 4, abs=1e-6)


def test_matches_python_reference(spark):
    lifetimes = [
        (i, (i * 3) % 5, (i * 3) % 5 + (i * 7) % 11) for i in range(40)
    ]
    # normalize: last >= first already; stagger ends
    assert _run(spark, lifetimes, horizon=2) == _km_py(lifetimes, 2)


def test_risk_set_exhausted_terminal_zero(spark):
    # user 3 is censored at lifetime 0 (last seen at stream end), so
    # at t=2 the remaining risk set is users 1 and 2 — and both churn:
    # d == n_at_risk, survival forced to exactly 0.0
    lifetimes = [(1, 0, 2), (2, 1, 3), (3, 20, 20)]
    got = _run(spark, lifetimes, horizon=3)
    assert got == [(2, 2, 2, 0, 0.0)]
    assert got == _km_py(lifetimes, 3)


def test_null_rows_excluded(spark):
    rows = _events([(1, 0, 1), (2, 0, 9)]) + [(None, D0), (3, None)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = km_curve(df, "user_id", "ts", churn_horizon_days=3).collect()
    assert [(r.duration_days, r.n_at_risk, r.n_events) for r in got] == [(1, 2, 1)]


def test_horizon_validation(spark):
    df = spark.createDataFrame(_events([(1, 0, 1)]), "user_id long, ts timestamp")
    with pytest.raises(ValueError):
        km_curve(df, "user_id", "ts", churn_horizon_days=-1)
