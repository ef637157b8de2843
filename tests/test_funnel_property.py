"""Property-based funnel semantics vs a pure-Python model.

The single sf0.001 oracle instance (q75) can't cover the edge cases of
sessionization + stepwise ordering: simultaneous events (same ts),
gaps exactly on the session boundary, steps missing or out of order.
Hypothesis generates small event logs biased toward those collisions
(timestamps on a coarse multiple-of-900s grid) and the Spark operator
must agree with the model on every (user, session) step timestamp.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.funnel import funnel_sessions

SET = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

STEPS = ("view", "click", "purchase")
GAP = 1800

# coarse grid -> frequent exact ties and exact-gap boundaries
TS = st.one_of(
    st.integers(min_value=0, max_value=8).map(lambda k: k * 900),
    st.integers(min_value=0, max_value=7200),
)
EVENT = st.tuples(
    st.integers(min_value=0, max_value=2),  # user
    TS,
    st.sampled_from(["view", "click", "purchase", "other"]),
)
LOG = st.lists(EVENT, min_size=1, max_size=25)


def model_funnel(events: list[tuple[int, int, str]]):
    """(user, ts, type) -> {(user, session_no): (t_0, t_1, t_2)}.
    Session numbering: per user, events ordered by (ts, event_id);
    new session when the gap from the previous event is >= GAP."""
    by_user = defaultdict(list)
    for eid, (u, ts, ty) in enumerate(events):
        by_user[u].append((ts, eid, ty))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        sessions = defaultdict(list)
        sess_no, prev_ts = 0, None
        for ts, _eid, ty in evs:
            if prev_ts is None or ts - prev_ts >= GAP:
                sess_no += 1
            sessions[sess_no].append((ts, ty))
            prev_ts = ts
        for sn, rows in sessions.items():
            t_prev, tvals = None, []
            for i, step in enumerate(STEPS):
                cand = [
                    ts
                    for ts, ty in rows
                    if ty == step and (i == 0 or (t_prev is not None and ts > t_prev))
                ]
                t = min(cand) if cand else None
                tvals.append(t)
                t_prev = t
            out[(u, sn)] = tuple(tvals)
    return out


@given(LOG)
@SET
def test_funnel_matches_model(spark, log):
    rows = [(u, eid, ts, ty) for eid, (u, ts, ty) in enumerate(log)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_s long, event_type string").select(
        "user_id", "event_id", F.timestamp_seconds(F.col("ts_s")).alias("ts"), "event_type"
    )
    got = {
        (r["user_id"], r["session_no"]): (r["u0"], r["u1"], r["u2"])
        for r in funnel_sessions(df, steps=STEPS, gap_seconds=GAP)
        .select(
            "user_id",
            "session_no",
            F.unix_timestamp("t_0").alias("u0"),
            F.unix_timestamp("t_1").alias("u1"),
            F.unix_timestamp("t_2").alias("u2"),
        )
        .collect()
    }
    assert got == model_funnel(log)


def test_funnel_directed_edges(spark):
    """Directed cases the fuzzer might miss in a short run: exact-gap
    boundary starts a new session; simultaneous view+click never
    converts (strict >); click before view doesn't count."""
    rows = [
        # user 0: view at t=0, click at exactly t=1800 -> NEW session,
        # so the click session has no view and no conversion
        (0, 0, 0, "view"),
        (0, 1, 1800, "click"),
        # user 1: simultaneous view+click at t=0 -> click not after view;
        # a later click converts, purchase at same ts as click does not
        (1, 2, 0, "view"),
        (1, 3, 0, "click"),
        (1, 4, 60, "click"),
        (1, 5, 60, "purchase"),
        # user 2: click then view (wrong order) -> no click conversion
        (2, 6, 0, "click"),
        (2, 7, 60, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_s long, event_type string").select(
        "user_id", "event_id", F.timestamp_seconds(F.col("ts_s")).alias("ts"), "event_type"
    )
    got = {
        (r["user_id"], r["session_no"]): (r["u0"], r["u1"], r["u2"])
        for r in funnel_sessions(df, steps=STEPS, gap_seconds=GAP)
        .select(
            "user_id",
            "session_no",
            F.unix_timestamp("t_0").alias("u0"),
            F.unix_timestamp("t_1").alias("u1"),
            F.unix_timestamp("t_2").alias("u2"),
        )
        .collect()
    }
    assert got == {
        (0, 1): (0, None, None),
        (0, 2): (None, None, None),
        (1, 1): (0, 60, None),
        (2, 1): (60, None, None),
    }
