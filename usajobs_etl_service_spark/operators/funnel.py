"""Sessionized stepwise funnel (extension operator, q75).

Reference capability: the reference's analytics surface stops at flat
aggregates (/root/reference/etl/etl.py:563-607); funnels are the standard
next ask of an events table and exercise the same window machinery as
its monitoring queries.

Semantics:
- sessions are gap-based islands per user: a new session starts when
  the time since the previous event is >= ``gap_seconds`` (an event
  exactly on the boundary starts a new session);
- a session reaches step i only stepwise: t_0 = min ts of step-0
  events; t_i = min ts of step-i events STRICTLY after t_{i-1}.
  Simultaneous events never satisfy a later step (strict >), and a
  missing earlier step nulls every later step.

Shape: three stacked window passes over ONE (user) shuffle+sort — no
self-joins, no per-step scans. Property-tested against a pure-Python
model in tests/test_funnel_property.py (simultaneous events,
gap-boundary ties, missing steps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Gaps-and-islands session numbering: events + ``session_no``
    (1-based per user). One (user) shuffle+sort; ``order_col`` makes
    the numbering deterministic under simultaneous events."""
    wo = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    marked = events.select(
        user_col,
        ts_col,
        order_col,
        *keep_cols,
        F.when(
            F.lag(ts_col).over(wo).isNull()
            | (
                F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(wo))
                >= gap_seconds
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return marked.withColumn(
        "session_no",
        F.sum("new_session").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("new_session")


def funnel_sessions(
    events: DataFrame,
    *,
    steps: Sequence[str],
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session step timestamps: one row per (user, session_no) with
    columns ``t_0 .. t_{len(steps)-1}`` — null from the first step the
    session failed to reach. ``order_col`` makes the session numbering
    deterministic under simultaneous events."""
    sess = assign_sessions(
        events,
        gap_seconds=gap_seconds,
        user_col=user_col,
        ts_col=ts_col,
        order_col=order_col,
        keep_cols=[type_col],
    )
    ws = Window.partitionBy(user_col, "session_no")
    df = sess
    prev: str | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        df = df.withColumn(f"t_{i}", F.min(F.when(cond, F.col(ts_col))).over(ws))
        prev = f"t_{i}"
    return df.groupBy(user_col, "session_no").agg(
        *[F.max(f"t_{i}").alias(f"t_{i}") for i in range(len(steps))]
    )


def funnel_counts(
    events: DataFrame,
    *,
    steps: Sequence[str],
    step_aliases: Sequence[str] | None = None,
    gap_seconds: int = 1800,
    **kwargs,
) -> DataFrame:
    """Scalar funnel summary: total sessions + how many reached each
    step (stepwise). ``step_aliases`` names the per-step count columns."""
    aliases = list(step_aliases or [f"n_step_{i}" for i in range(len(steps))])
    sessions = funnel_sessions(events, steps=steps, gap_seconds=gap_seconds, **kwargs)
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        *[
            F.sum(F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)).alias(a)
            for i, a in enumerate(aliases)
        ],
    )


def session_paths(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
    sep: str = ">",
    top_k: int = 15,
) -> DataFrame:
    """Top-k most common within-session event-type sequences ("paths"):
    sessionize (gaps-and-islands, one user shuffle), build each
    session's ordered path WITHOUT an ordered window — collect the
    (ts, order, type) structs per session, ``array_sort`` them (struct
    sort is lexicographic over the fields, so the order key is explicit
    and partition-order-independent), project the types, join with
    ``sep`` — then one path-count aggregate and a top-k rank with a
    lexical tiebreak."""
    from pyspark.sql import Window as W

    sess = assign_sessions(
        events,
        gap_seconds=gap_seconds,
        user_col=user_col,
        ts_col=ts_col,
        order_col=order_col,
        keep_cols=[type_col],
    )
    paths = sess.groupBy(user_col, "session_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(ts_col), F.col(order_col), F.col(type_col)))
                ),
                lambda s: s[type_col],
            ),
            sep,
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    w = W.orderBy(F.col("n").desc(), F.col("path").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("rank", "path", "n")
    )
