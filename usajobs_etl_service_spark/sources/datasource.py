"""S1-S3 as a native PySpark DataSource (Python Data Source API,
Spark 4): ``spark.read.format("usajobs_rest")`` with page-partition
planning and option pushdown.

Two source flavors ship for the same API surface:

- ``sources/rest_api.py`` — driver-side spool scan: the RIGHT shape for
  a rate-limited live API (one polite client, retry/breaker policies,
  O(1-page) driver memory). Default for production ingest.
- this module — a DataSourceV2-style reader where EACH PAGE IS AN INPUT
  PARTITION fetched executor-side in parallel. The right shape for
  bulk/mirrored endpoints with no rate limit (or per-partition token
  buckets): scan width scales with the cluster, and Catalyst sees a
  real source with options pushdown (S2) and partition planning (S3).

Pushdown options (S2 parity, reference etl.py:191-199): ``keyword``,
``location``, ``results_per_page`` (clamped to 500), ``max_pages``.
Partition planning (S3): a driver-side probe of page 1 reads
``SearchResultCountAll`` and plans ``ceil(count_all/per_page)`` page
partitions, capped by ``max_pages`` — the early-exit limit lives in the
planner, not the executors.

The ``mock`` mode generates deterministic synthetic pages executor-side
(seeded by page number) so the full distributed path is testable with
no network; a live deployment supplies ``base_url`` +
``auth_header_json`` and the partition fetch uses the same retrying
transport as the spool source.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGE_SIZE_CAP = 500

RAW_SCHEMA = "page int, payload string"


def _mock_page(page: int, per_page: int, total: int, seed: int = 42) -> dict:
    """Deterministic synthetic page (same recipe as the perf-suite
    generators in FIXTURES.md §2): titles/orgs cycle, URIs unique."""
    start = (page - 1) * per_page
    n = max(0, min(per_page, total - start))
    items = [
        {
            "MatchedObjectDescriptor": {
                "PositionTitle": f"Data Engineer {start + i}",
                "PositionURI": f"https://www.usajobs.gov/job/{seed}-{start + i}",
                "OrganizationName": f"Department {(start + i) % 10}",
                "PositionLocation": [
                    {"CityName": f"City {(start + i) % 10}", "StateCode": f"S{(start + i) % 5}", "CountryCode": "US"}
                ],
                "PositionRemuneration": [
                    {"MinimumRange": str(80000 + (start + i) * 100), "RateIntervalCode": "Per Year"}
                ],
            }
        }
        for i in range(n)
    ]
    return {
        "SearchResult": {
            "SearchResultCount": len(items),
            "SearchResultCountAll": total,
            "SearchResultItems": items,
        }
    }


class PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class RestJobsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.per_page = min(int(options.get("results_per_page", PAGE_SIZE_CAP)), PAGE_SIZE_CAP)
        self.max_pages = int(options.get("max_pages", 20))
        self.mode = options.get("mode", "mock")
        self.total = int(options.get("mock_total", 1200))
        self.seed = int(options.get("mock_seed", 42))

    # -- S3: partition planning --------------------------------------------
    def partitions(self):
        if self.mode == "mock":
            count_all = self.total
        else:  # pragma: no cover — live probe
            probe = self._fetch(1)
            count_all = probe.get("SearchResult", {}).get("SearchResultCountAll", 0)
        n_pages = max((count_all + self.per_page - 1) // self.per_page, 0)
        n_pages = min(n_pages, self.max_pages)
        return [PagePartition(p) for p in range(1, n_pages + 1)]

    # -- S1: per-partition page fetch --------------------------------------
    def _fetch(self, page: int) -> dict:
        if self.mode == "mock":
            return _mock_page(page, self.per_page, self.total, self.seed)
        # pragma: no cover — live transport (same policies as rest_api)
        from usajobs_etl_service_spark.sources.rest_api import RetryPolicy, http_transport

        transport = http_transport(
            self.options["base_url"], json.loads(self.options.get("auth_header_json", "{}"))
        )
        params = {
            "Keyword": self.options.get("keyword", ""),
            "ResultsPerPage": self.per_page,
            "Page": page,
            "WhoMayApply": "All",
        }
        if self.options.get("location"):
            params["LocationName"] = self.options["location"]
        return RetryPolicy().call(lambda: transport(params))

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        payload = self._fetch(partition.page)
        yield (partition.page, json.dumps(payload))


class RestJobsDataSource(DataSource):
    """``spark.read.format("usajobs_rest")`` — register with
    ``register_rest_datasource(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "usajobs_rest"

    def schema(self) -> str:
        return RAW_SCHEMA

    def reader(self, schema) -> RestJobsReader:
        return RestJobsReader(self.options)


def register_rest_datasource(spark) -> None:
    spark.dataSource.register(RestJobsDataSource)


def read_rest_jobs(spark, **options):
    """Convenience: registered read -> flattened canonical postings."""
    from usajobs_etl_service_spark.sources.ingest import flatten_postings, parse_api_pages

    register_rest_datasource(spark)
    reader = spark.read.format("usajobs_rest")
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.load()
    return flatten_postings(parse_api_pages(raw))
