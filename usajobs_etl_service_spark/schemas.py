"""Explicit StructTypes for every shape that flows through the pipeline.

Schema is declared, never inferred (parity with the reference's fixed
dataclass + DDL: reference ``etl/etl.py:96-128``, ``init.sql:2-17``,
API document fixture ``tests/conftest.py:131-181``). Declared schemas are
also the 100 TB posture: ``spark.read.json`` with an explicit schema skips
the inference pass (a full extra scan) and keeps the scan single-pass.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Nested API search-result document (reference FIXTURES §1).
# ---------------------------------------------------------------------------

POSITION_LOCATION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("CityName", T.StringType()),
            T.StructField("StateCode", T.StringType()),
            T.StructField("CountryCode", T.StringType()),
        ]
    )
)

POSITION_REMUNERATION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            # numbers arrive as strings, e.g. "80000" — parsed, not cast, downstream
            T.StructField("MinimumRange", T.StringType()),
            T.StructField("MaximumRange", T.StringType()),
            T.StructField("RateIntervalCode", T.StringType()),
        ]
    )
)

MATCHED_OBJECT_DESCRIPTOR_SCHEMA = T.StructType(
    [
        T.StructField("PositionTitle", T.StringType()),
        T.StructField("PositionURI", T.StringType()),
        T.StructField("PositionLocation", POSITION_LOCATION_SCHEMA),
        T.StructField("PositionRemuneration", POSITION_REMUNERATION_SCHEMA),
        T.StructField("OrganizationName", T.StringType()),
        T.StructField("DepartmentName", T.StringType()),
        T.StructField("PositionStartDate", T.StringType()),
        T.StructField("PositionEndDate", T.StringType()),
        T.StructField("JobCategory", T.ArrayType(T.StructType([T.StructField("Name", T.StringType())]))),
        T.StructField("JobGrade", T.ArrayType(T.StructType([T.StructField("Code", T.StringType())]))),
    ]
)

SEARCH_RESULT_ITEM_SCHEMA = T.StructType(
    [T.StructField("MatchedObjectDescriptor", MATCHED_OBJECT_DESCRIPTOR_SCHEMA)]
)

API_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField(
            "SearchResult",
            T.StructType(
                [
                    T.StructField("SearchResultCount", T.LongType()),
                    T.StructField("SearchResultCountAll", T.LongType()),
                    T.StructField("SearchResultItems", T.ArrayType(SEARCH_RESULT_ITEM_SCHEMA)),
                ]
            ),
        )
    ]
)

# ---------------------------------------------------------------------------
# Canonical relational record (reference FIXTURES §2 / init.sql:2-17).
# The SERIAL surrogate id is omitted: no query depends on its values and a
# global sequence is an anti-pattern at cluster scale.
# ---------------------------------------------------------------------------

JOB_POSTING_SCHEMA = T.StructType(
    [
        T.StructField("position_title", T.StringType(), False),
        T.StructField("position_uri", T.StringType(), False),
        T.StructField("position_location", T.StringType()),
        T.StructField("position_remuneration", T.StringType()),
        T.StructField("position_start_date", T.DateType()),
        T.StructField("position_end_date", T.DateType()),
        T.StructField("organization_name", T.StringType()),
        T.StructField("department_name", T.StringType()),
        T.StructField("job_category", T.StringType()),
        T.StructField("job_grade", T.StringType()),
        T.StructField("extracted_at", T.TimestampType(), False),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

# Run-log table (reference init.sql:73-80): small append-only table.
ETL_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("last_run_at", T.TimestampType()),
        T.StructField("jobs_processed", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_message", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)
