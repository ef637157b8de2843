"""CDC change-stream application (operators/cdc.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.cdc import cdc_apply, latest_changes

BASE_SCHEMA = "k long, v string"
CHG_SCHEMA = "k long, v string, seq long, op string"


def _base(spark, rows):
    return spark.createDataFrame(rows, BASE_SCHEMA)


def _chg(spark, rows):
    return spark.createDataFrame(rows, CHG_SCHEMA)


def _apply(spark, base_rows, chg_rows):
    out = cdc_apply(
        _base(spark, base_rows),
        _chg(spark, chg_rows),
        key_cols=["k"],
        seq_cols=["seq"],
    )
    return {r["k"]: r["v"] for r in out.collect()}


def test_insert_update_delete_passthrough(spark):
    got = _apply(
        spark,
        [(1, "old1"), (2, "old2"), (3, "old3")],
        [
            (1, "new1", 10, "U"),   # update existing
            (2, "gone", 10, "D"),   # delete existing
            (9, "new9", 10, "U"),   # insert new key
        ],
    )
    assert got == {1: "new1", 3: "old3", 9: "new9"}


def test_latest_wins_ordering(spark):
    got = _apply(
        spark,
        [],
        [
            (1, "a", 1, "U"),
            (1, "b", 3, "U"),
            (1, "c", 2, "U"),
        ],
    )
    assert got == {1: "b"}


def test_delete_then_reinsert_order_matters(spark):
    # delete at seq 2, reinsert at seq 3 -> key survives with new image
    got = _apply(spark, [(1, "old")], [(1, "x", 2, "D"), (1, "y", 3, "U")])
    assert got == {1: "y"}
    # reinsert at 1, delete at 2 -> key gone
    got = _apply(spark, [(1, "old")], [(1, "y", 1, "U"), (1, "x", 2, "D")])
    assert got == {}


def test_multi_column_seq_tiebreak(spark):
    chg = spark.createDataFrame(
        [(1, "a", 5, 1, "U"), (1, "b", 5, 2, "U")],
        "k long, v string, seq long, sub long, op string",
    )
    latest = latest_changes(chg, key_cols=["k"], seq_cols=["seq", "sub"])
    assert [r["v"] for r in latest.collect()] == ["b"]


def test_missing_base_column_raises(spark):
    base = _base(spark, [(1, "a")])
    chg = spark.createDataFrame([(1, 9, "U")], "k long, seq long, op string")
    with pytest.raises(ValueError, match="missing base columns"):
        cdc_apply(base, chg, key_cols=["k"], seq_cols=["seq"])


def test_base_never_shuffled_by_window(spark):
    # The latest-wins window must run over the CHANGES side only: the
    # base table reaches the output through an anti join, not a window.
    base = _base(spark, [(i, "b") for i in range(100)])
    chg = _chg(spark, [(1, "x", 1, "U")])
    plan = (
        cdc_apply(base, chg, key_cols=["k"], seq_cols=["seq"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    # every window (the latest-wins subtree appears once per union
    # branch, both over changes) is KEY-partitioned — no global window
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(k#" in line


def test_null_op_is_upsert_never_silent_delete(spark):
    # review finding: op != 'D' is NULL for NULL ops, which dropped the
    # key from BOTH branches — a silent delete. NULL op must upsert.
    chg = spark.createDataFrame(
        [(1, "new", 5, None)], "k long, v string, seq long, op string"
    )
    got = {
        r["k"]: r["v"]
        for r in cdc_apply(
            _base(spark, [(1, "old")]), chg, key_cols=["k"], seq_cols=["seq"]
        ).collect()
    }
    assert got == {1: "new"}


# -- property test: random change streams vs a pure-Python model --

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PSET = settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
CHANGE = st.tuples(
    st.integers(min_value=0, max_value=6),          # key
    st.text(alphabet="ab", min_size=1, max_size=2), # payload
    st.sampled_from(["U", "D"]),
)


@given(
    st.lists(st.integers(min_value=0, max_value=6), max_size=5, unique=True),
    st.lists(CHANGE, max_size=20),
)
@PSET
def test_cdc_apply_matches_model(spark, base_keys, changes):
    base_rows = [(k, f"base{k}") for k in base_keys]
    chg_rows = [(k, v, i, op) for i, (k, v, op) in enumerate(changes)]
    got = _apply(spark, base_rows, chg_rows)

    state = {k: f"base{k}" for k in base_keys}
    latest: dict = {}
    for i, (k, v, op) in enumerate(changes):
        latest[k] = (i, v, op)   # seq == index, so later always wins
    for k, (_, v, op) in latest.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


def test_null_key_in_change_stream_raises(spark):
    """NULL-keyed change rows can never address a base row (the joins
    are null-unsafe): a NULL-keyed delete would silently no-op and a
    NULL-keyed upsert would append a duplicate. cdc_apply fails fast
    instead (ADVICE r6); NULL-keyed BASE rows are fine and pass
    through."""
    from py4j.protocol import Py4JJavaError

    base = _base(spark, [(1, "a"), (None, "nullkey")])
    ok = cdc_apply(
        base, _chg(spark, [(2, "b", 1, "U")]), key_cols=["k"], seq_cols=["seq"]
    )
    got = {r["k"]: r["v"] for r in ok.collect()}
    assert got == {1: "a", None: "nullkey", 2: "b"}

    bad = cdc_apply(
        base, _chg(spark, [(None, "x", 1, "D")]), key_cols=["k"], seq_cols=["seq"]
    )
    with pytest.raises(Exception, match="NULL key"):
        bad.collect()
