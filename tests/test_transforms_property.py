"""Property-based parity: the native Column expressions must agree with
an independent pure-Python model of the reference's documented
semantics (FIXTURES.md §4 goldens generalized) on randomized inputs —
including empty strings, missing fields, and garbage numbers."""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from usajobs_etl_service_spark.functions import transforms as X
from usajobs_etl_service_spark.schemas import POSITION_LOCATION_SCHEMA, POSITION_REMUNERATION_SCHEMA

# ---------------------------------------------------------------------------
# Pure-Python models of the documented semantics (not the reference code)
# ---------------------------------------------------------------------------


def model_location(loc):
    if not loc:
        return "Location not specified"
    city, state, country = loc[0]
    country = "US" if country is None else country
    parts = [p for p in (city, state, country) if p]
    return ", ".join(parts) if parts else "Location not specified"


def _num(s):
    try:
        return int(float(s))
    except (TypeError, ValueError):
        return None


def model_remuneration(rem):
    if not rem:
        return "Not specified"
    mn, mx, interval = rem[0]
    interval = interval or ""
    mn_v = _num(mn) if mn else None
    mx_v = _num(mx) if mx else None
    if mn and mx:
        if mn_v is None or mx_v is None:
            return "Not specified"
        return f"${mn_v:,} - ${mx_v:,} {interval}"
    if mn:
        if mn_v is None:
            return "Not specified"
        return f"${mn_v:,}+ {interval}"
    return "Not specified"


def model_date(s):
    if not s:
        return None
    try:
        return datetime.fromisoformat(s.replace("Z", "+00:00")).date()
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# Strategies
# ---------------------------------------------------------------------------

name_st = st.one_of(st.none(), st.sampled_from(["", "Washington", "New York", "x", "  "]))
country_st = st.one_of(st.none(), st.sampled_from(["", "US", "CA"]))
loc_st = st.one_of(
    st.none(),
    st.just([]),
    st.lists(st.tuples(name_st, name_st, country_st), min_size=1, max_size=2),
)

money_st = st.one_of(
    st.none(),
    st.sampled_from(["", "0", "80000", "80000.9", "1234567.5", "not-a-number", "1e3", "-500", "-500.9"]),
)
interval_st = st.one_of(st.none(), st.sampled_from(["", "Per Year", "Per Hour"]))
rem_st = st.one_of(
    st.none(),
    st.just([]),
    st.lists(st.tuples(money_st, money_st, interval_st), min_size=1, max_size=2),
)

date_st = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "",
            "2023-01-01T00:00:00.0000000",
            "2023-06-15T12:34:56Z",
            "2024-02-29T00:00:00",
            "invalid-date",
            "2023-13-45T00:00:00",
            "2023-01-01",
        ]
    ),
)


def _run_batch(spark, values, schema, expr_fn):
    df = spark.createDataFrame(
        [(v,) for v in values], schema=T.StructType([T.StructField("v", schema)])
    )
    return [r["out"] for r in df.select(expr_fn(F.col("v")).alias("out")).collect()]


SET = settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(st.lists(loc_st, min_size=1, max_size=40))
@SET
def test_location_parity(spark, cases):
    got = _run_batch(spark, cases, POSITION_LOCATION_SCHEMA, X.render_location)
    expected = [model_location(c) for c in cases]
    assert got == expected


@given(st.lists(rem_st, min_size=1, max_size=40))
@SET
def test_remuneration_parity(spark, cases):
    got = _run_batch(spark, cases, POSITION_REMUNERATION_SCHEMA, X.render_remuneration)
    expected = [model_remuneration(c) for c in cases]
    assert got == expected


@given(st.lists(date_st, min_size=1, max_size=40))
@SET
def test_date_parity(spark, cases):
    got = _run_batch(spark, cases, T.StringType(), X.parse_iso_date)
    expected = [model_date(c) for c in cases]
    assert got == expected
