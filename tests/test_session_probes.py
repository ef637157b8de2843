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


class TestLookupSizeGuard:
    """VERDICT r12 #3: the driver-side pyarrow lookup must refuse —
    BEFORE reading any data pages — layouts the footer metadata says
    are too big, so callers fall back to the distributed Spark path."""

    def _multi_file_table(self, tmp_path, n_files: int) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / "wide.parquet"
        d.mkdir()
        for i in range(n_files):
            pq.write_table(
                pa.table({"k": [i * 10 + j for j in range(10)], "v": [f"r{i}"] * 10}),
                d / f"part-{i:05d}.parquet",
            )
        return str(tmp_path)

    def test_file_count_guard_falls_back(self, tmp_path):
        base = self._multi_file_table(tmp_path, 5)
        # under the cap: the lookup works
        assert parquet_lookup_value(base, "wide", "k", 12, "v", max_files=64) == "r1"
        # over the cap: None (Spark fallback), even though the key exists
        assert parquet_lookup_value(base, "wide", "k", 12, "v", max_files=4) is None

    def test_candidate_bytes_guard_falls_back(self, tmp_path):
        base = self._multi_file_table(tmp_path, 3)
        # a 1-byte budget can't admit any candidate row group
        assert (
            parquet_lookup_value(base, "wide", "k", 12, "v", max_candidate_bytes=1)
            is None
        )

    def test_stats_pruning_keeps_small_lookups_under_budget(self, tmp_path):
        # row-group stats exclude the non-matching files, so the
        # candidate set stays one group even with a tight budget
        import pyarrow.parquet as pq

        base = self._multi_file_table(tmp_path, 3)
        one_group = pq.read_metadata(
            tmp_path / "wide.parquet" / "part-00000.parquet"
        ).row_group(0).total_byte_size
        assert (
            parquet_lookup_value(
                base, "wide", "k", 12, "v", max_candidate_bytes=one_group + 1
            )
            == "r1"
        )

    def test_default_guards_admit_testdata(self):
        # the sf0.001 embeddings table is one small file: the production
        # defaults must keep the fast path (probe queries unchanged)
        got = parquet_lookup_value(SF_DIRS[0], "embeddings", "vec_id", 0, "embedding")
        assert got is not None
