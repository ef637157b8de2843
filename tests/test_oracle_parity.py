"""The driver's correctness gate, run locally at sf0.001: every
``queries()`` entry must hash-match its DuckDB ``oracle_sql()``."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.verify_oracle import TABLES, compare


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    result = compare(name, spark, duck, sf_dir)
    assert result.startswith(("OK", "SKIP")), result


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
