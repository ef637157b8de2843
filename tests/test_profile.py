"""profile_table: hand-checked stats, null/all-null handling, and the
one-aggregate-pass plan invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.profiling import profile_table


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (2, None, None), (4, "a", None)],
        "k int, s string, z string",
    )


def test_profile_hand_values(spark):
    rows = {r["column"]: r for r in profile_table(_df(spark)).collect()}
    assert set(rows) == {"k", "s", "z"}
    k = rows["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_value"], k["max_value"]) == ("1", "4")
    s = rows["s"]
    assert (s["n_nulls"], s["n_distinct"], s["min_value"], s["max_value"]) == (1, 2, "a", "b")
    z = rows["z"]  # all-NULL column
    assert (z["n_nulls"], z["n_distinct"]) == (4, 0)
    assert z["min_value"] is None and z["max_value"] is None


def test_profile_column_subset_and_validation(spark):
    out = profile_table(_df(spark), ["k"]).collect()
    assert len(out) == 1 and out[0]["column"] == "k"
    with pytest.raises(ValueError):
        profile_table(_df(spark), [])
    with pytest.raises(ValueError):
        profile_table(_df(spark), ["nope"])


def test_profile_is_one_scan(spark, sf_dir):
    """Profiling k columns must read the table ONCE: a single scan node
    in the executed plan, no unions of per-column passes."""
    from usajobs_etl_service_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    p = (
        profile_table(docs, ["doc_id", "lang", "source", "n_chars"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("Scan parquet") == 1, p[:800]
    assert "Union" not in p


def test_profile_map_column_degrades_gracefully(spark):
    """Map columns are neither orderable nor groupable in Spark: the
    profile row still carries count/null stats with NULL
    distinct/extrema instead of failing the whole pass."""
    df = spark.createDataFrame([(1, {"a": 1}), (2, None)], "k int, m map<string,int>")
    rows = {r["column"]: r for r in profile_table(df).collect()}
    m = rows["m"]
    assert (m["n_rows"], m["n_nulls"]) == (2, 1)
    assert m["n_distinct"] is None and m["min_value"] is None and m["max_value"] is None
    assert rows["k"]["n_distinct"] == 2


def test_profile_handles_quoted_column_name(spark):
    df = spark.range(3).select(F.col("id").alias("it's"))
    rows = profile_table(df).collect()
    assert rows[0]["column"] == "it's" and rows[0]["n_distinct"] == 3
