"""Golden unit tests on the scalar transforms — the same expected
literals the reference asserts (reference tests/test_unit.py:184-229),
run through the native Column expressions."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from usajobs_etl_service_spark.functions import transforms as X
from usajobs_etl_service_spark.schemas import POSITION_LOCATION_SCHEMA, POSITION_REMUNERATION_SCHEMA


def _one(spark, value, schema, expr_fn):
    if isinstance(schema, str):
        df = spark.createDataFrame([(value,)], schema=f"v {schema}")
    else:
        from pyspark.sql import types as T

        df = spark.createDataFrame([(value,)], schema=T.StructType([T.StructField("v", schema)]))
    return df.select(expr_fn(F.col("v")).alias("out")).first()["out"]


class TestLocationRender:
    def test_single_location(self, spark):
        loc = [("Washington", "DC", "US")]
        assert _one(spark, loc, POSITION_LOCATION_SCHEMA, X.render_location) == "Washington, DC, US"

    def test_empty_list(self, spark):
        assert _one(spark, [], POSITION_LOCATION_SCHEMA, X.render_location) == "Location not specified"

    def test_null(self, spark):
        assert _one(spark, None, POSITION_LOCATION_SCHEMA, X.render_location) == "Location not specified"

    def test_missing_country_defaults_us(self, spark):
        loc = [("Washington", "DC", None)]
        assert _one(spark, loc, POSITION_LOCATION_SCHEMA, X.render_location) == "Washington, DC, US"

    def test_city_only(self, spark):
        loc = [("Washington", "", "")]
        assert _one(spark, loc, POSITION_LOCATION_SCHEMA, X.render_location) == "Washington"


class TestRemunerationRender:
    def test_range(self, spark):
        rem = [("80000", "120000", "Per Year")]
        assert (
            _one(spark, rem, POSITION_REMUNERATION_SCHEMA, X.render_remuneration)
            == "$80,000 - $120,000 Per Year"
        )

    def test_minimum_only(self, spark):
        rem = [("80000", None, "Per Year")]
        assert _one(spark, rem, POSITION_REMUNERATION_SCHEMA, X.render_remuneration) == "$80,000+ Per Year"

    def test_empty(self, spark):
        assert _one(spark, [], POSITION_REMUNERATION_SCHEMA, X.render_remuneration) == "Not specified"

    def test_null(self, spark):
        assert _one(spark, None, POSITION_REMUNERATION_SCHEMA, X.render_remuneration) == "Not specified"

    def test_parse_error(self, spark):
        rem = [("not-a-number", "120000", "Per Year")]
        assert _one(spark, rem, POSITION_REMUNERATION_SCHEMA, X.render_remuneration) == "Not specified"

    def test_truncation_not_rounding(self, spark):
        rem = [("80000.9", None, "Per Year")]
        assert _one(spark, rem, POSITION_REMUNERATION_SCHEMA, X.render_remuneration) == "$80,000+ Per Year"


class TestDateParse:
    def test_valid_iso_7_frac_digits(self, spark):
        out = _one(spark, "2023-01-01T00:00:00.0000000", "string", X.parse_iso_date)
        assert out == datetime.date(2023, 1, 1)

    def test_z_suffix(self, spark):
        out = _one(spark, "2023-06-15T12:00:00Z", "string", X.parse_iso_date)
        assert out == datetime.date(2023, 6, 15)

    def test_invalid(self, spark):
        assert _one(spark, "invalid-date", "string", X.parse_iso_date) is None

    def test_null(self, spark):
        assert _one(spark, None, "string", X.parse_iso_date) is None


class TestValidation:
    def test_filter(self, spark):
        rows = [
            ("Data Engineer", "https://www.usajobs.gov/job/1"),  # valid
            ("", "https://x"),  # blank title
            ("  ", "https://x"),  # whitespace title
            ("T", "ftp://x"),  # non-http uri
            ("T", ""),  # blank uri
            (None, "https://x"),  # null title
        ]
        df = spark.createDataFrame(rows, "title string, uri string")
        kept = df.filter(X.is_valid_posting(F.col("title"), F.col("uri"))).collect()
        assert len(kept) == 1
        assert kept[0]["title"] == "Data Engineer"


class TestMoneyFormat:
    def test_comma_grouping(self, spark):
        assert _one(spark, "1234567", "string", X.format_money) == "1,234,567"

    def test_truncates(self, spark):
        assert _one(spark, "999.99", "string", X.format_money) == "999"


class TestTextMatches:
    def _hits(self, spark, query, texts):
        df = spark.createDataFrame([(t,) for t in texts], "body string")
        return [r["body"] for r in df.filter(X.text_matches(F.col("body"), query)).collect()]

    def test_conjunctive_word_match(self, spark):
        texts = ["data engineer role", "data scientist", "senior engineer"]
        assert self._hits(spark, "data engineer", texts) == ["data engineer role"]

    def test_regex_metacharacters_are_literal(self, spark):
        # "c++" must match literally, not as an (invalid) regex
        texts = ["expert c++ developer", "c programmer", "cpp developer"]
        assert self._hits(spark, "c++", texts) == ["expert c++ developer"]

    def test_dotted_term(self, spark):
        # "." is a literal dot, not any-char
        texts = ["node.js services", "nodexjs services"]
        assert self._hits(spark, "node.js", texts) == ["node.js services"]

    def test_word_boundary_still_applies(self, spark):
        texts = ["java developer", "javascript developer"]
        assert self._hits(spark, "java", texts) == ["java developer"]


class TestRedaction:
    def _r(self, spark, s):
        from usajobs_etl_service_spark.functions.text import redact_pii

        df = spark.createDataFrame([(s,)], "v string")
        return df.select(redact_pii(F.col("v")).alias("out")).first()["out"]

    def test_all_patterns(self, spark):
        s = "mail a.b+c@x-corp.io, ssn 123-45-6789, call (415) 555-1234 or 1-415-555-9999, host 192.168.0.1"
        out = self._r(spark, s)
        assert "<EMAIL>" in out and "<SSN>" in out and "<PHONE>" in out and "<IP>" in out
        assert "@" not in out and "123-45-6789" not in out and "192.168" not in out

    def test_ssn_not_eaten_by_phone(self, spark):
        assert self._r(spark, "id 987-65-4321 end") == "id <SSN> end"

    def test_clean_text_untouched(self, spark):
        s = "no contact info here, just words and the number 42"
        assert self._r(spark, s) == s
