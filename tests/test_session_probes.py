"""Round-12 optimization guards: the driver-side parquet probes
(footer stats, single-row lookup, footer-derived schema) must be
value- and schema-identical to the Spark paths they replace — the
optimization is a cheaper route to the same answer, never a different
answer."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.session import (
    _footer_schema,
    parquet_col_stat,
    parquet_lookup_value,
    read_table,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


class TestFooterSchema:
    @pytest.mark.parametrize("sf_dir", SF_DIRS)
    def test_matches_spark_inference_every_table(self, spark, sf_dir):
        for name in TABLES:
            inferred = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
            derived = _footer_schema(f"{sf_dir}/{name}.parquet")
            assert derived is not None, name
            assert derived == inferred, name

    def test_missing_path_falls_back(self):
        assert _footer_schema("/nonexistent/nope.parquet") is None

    def test_read_table_schema_unchanged(self, spark):
        # the fast path must hand Spark the schema inference would have
        # produced, including the events ts normalization contract
        for name in TABLES:
            df = read_table(spark, SF_DIRS[0], name)
            assert df.schema == spark.read.parquet(
                f"{SF_DIRS[0]}/{name}.parquet"
            ).schema or name == "events"


class TestColStat:
    @pytest.mark.parametrize("sf_dir", SF_DIRS)
    def test_min_max_match_spark(self, spark, sf_dir):
        for name, col in [
            ("orders", "o_orderkey"),
            ("orders", "o_totalprice"),
            ("lineitem", "l_partkey"),
            ("events", "event_id"),
        ]:
            df = read_table(spark, sf_dir, name)
            row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
            assert parquet_col_stat(sf_dir, name, col, "min") == row["mn"], (name, col)
            assert parquet_col_stat(sf_dir, name, col, "max") == row["mx"], (name, col)

    def test_string_columns_never_trusted(self):
        # string stats can be writer-truncated: the helper must refuse
        assert parquet_col_stat(SF_DIRS[0], "orders", "o_orderstatus", "max") is None

    def test_missing_column_or_table(self):
        assert parquet_col_stat(SF_DIRS[0], "orders", "no_such_col", "max") is None
        assert parquet_col_stat(SF_DIRS[0], "no_such_table", "x", "max") is None


class TestMaxDateProbe:
    @pytest.mark.parametrize("sf_dir", SF_DIRS)
    def test_equals_spark_aggregate(self, spark, sf_dir):
        import __spark_entry__ as em

        for table, ts_col in [("orders", "o_orderdate"), ("events", "ts")]:
            fast = em._max_date(spark, sf_dir, table, ts_col)
            slow = (
                read_table(spark, sf_dir, table)
                .agg(F.max(F.to_date(ts_col)))
                .first()[0]
            )
            assert fast == slow, (table, fast, slow)
            assert isinstance(fast, datetime.date)


class TestLookupValue:
    @pytest.mark.parametrize("sf_dir", SF_DIRS)
    def test_qvec_equals_spark_first(self, spark, sf_dir):
        import __spark_entry__ as em

        for vec_id in (0, 1):
            fast = em._qvec(spark, sf_dir, vec_id)
            slow = [
                float(x)
                for x in read_table(spark, sf_dir, "embeddings")
                .filter(F.col("vec_id") == vec_id)
                .select("embedding")
                .first()[0]
            ]
            assert fast == slow

    def test_missing_key_returns_none(self):
        assert (
            parquet_lookup_value(SF_DIRS[0], "embeddings", "vec_id", -999, "embedding")
            is None
        )
