"""S4 ingest + flatten on the reference's canonical API document fixture
(reference tests/conftest.py:131-181): one realistic document, edge
documents (empty items, missing optionals, malformed payload)."""

from __future__ import annotations

import datetime
import json

from usajobs_etl_service_spark.sources.ingest import flatten_postings, parse_api_pages

FULL_DOC = {
    "SearchResult": {
        "SearchResultCount": 2,
        "SearchResultCountAll": 2,
        "SearchResultItems": [
            {
                "MatchedObjectDescriptor": {
                    "PositionTitle": "  Data Engineer ",
                    "PositionURI": "https://www.usajobs.gov/job/123",
                    "PositionLocation": [
                        {"CityName": "Washington", "StateCode": "DC", "CountryCode": "US"}
                    ],
                    "PositionRemuneration": [
                        {"MinimumRange": "80000", "MaximumRange": "120000", "RateIntervalCode": "Per Year"}
                    ],
                    "OrganizationName": "Department of Defense",
                    "DepartmentName": "DoD",
                    "PositionStartDate": "2023-01-01T00:00:00.0000000",
                    "PositionEndDate": "2023-12-31T00:00:00.0000000",
                    "JobCategory": [{"Name": "Information Technology"}],
                    "JobGrade": [{"Code": "GS-13"}],
                }
            },
            {
                # missing optionals; blank title -> filtered by P2
                "MatchedObjectDescriptor": {
                    "PositionTitle": "   ",
                    "PositionURI": "https://www.usajobs.gov/job/124",
                }
            },
            {
                # minimal valid: defaults everywhere
                "MatchedObjectDescriptor": {
                    "PositionTitle": "Analyst",
                    "PositionURI": "https://www.usajobs.gov/job/125",
                }
            },
        ],
    }
}

EMPTY_DOC = {"SearchResult": {"SearchResultCount": 0, "SearchResultCountAll": 0, "SearchResultItems": []}}


def _flatten(spark, payloads):
    raw = spark.createDataFrame(
        [(i, json.dumps(p) if isinstance(p, dict) else p) for i, p in enumerate(payloads)],
        "page int, payload string",
    )
    return flatten_postings(parse_api_pages(raw))


def test_full_document(spark):
    rows = {r["position_uri"]: r for r in _flatten(spark, [FULL_DOC]).collect()}
    assert set(rows) == {"https://www.usajobs.gov/job/123", "https://www.usajobs.gov/job/125"}
    r = rows["https://www.usajobs.gov/job/123"]
    assert r["position_title"] == "Data Engineer"  # trimmed (F1)
    assert r["position_location"] == "Washington, DC, US"  # F2 golden
    assert r["position_remuneration"] == "$80,000 - $120,000 Per Year"  # F3 golden
    assert r["position_start_date"] == datetime.date(2023, 1, 1)  # F4 golden
    assert r["position_end_date"] == datetime.date(2023, 12, 31)
    assert r["organization_name"] == "Department of Defense"
    assert r["job_category"] == "Information Technology"  # F5
    assert r["job_grade"] == "GS-13"
    # defaults on the minimal row (F2/F3/F5/F6)
    m = rows["https://www.usajobs.gov/job/125"]
    assert m["position_location"] == "Location not specified"
    assert m["position_remuneration"] == "Not specified"
    assert m["position_start_date"] is None
    assert m["organization_name"] == ""
    assert m["job_category"] == ""


def test_empty_and_malformed_pages(spark):
    out = _flatten(spark, [EMPTY_DOC, "{not json", json.dumps({"InvalidKey": 1})])
    assert out.count() == 0  # P3 tolerance: drop, don't fail


def test_ingest_seq_deterministic(spark):
    out = _flatten(spark, [FULL_DOC]).select("ingest_seq", "position_uri").collect()
    seqs = {r["position_uri"]: r["ingest_seq"] for r in out}
    # page 0: item 0 -> seq 0, item 2 -> seq 2 (item 1 filtered)
    assert seqs == {"https://www.usajobs.gov/job/123": 0, "https://www.usajobs.gov/job/125": 2}
