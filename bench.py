"""Benchmark harness: run the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full computation, no
driver collect). The headline value is the sum of per-query seconds.
Reference floors for context (BASELINE.md): upsert >50 rows/s, JSON
extract >100 rows/s, end-to-end >20 rows/s — also emitted as derived
throughputs where the query maps 1:1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from usajobs_etl_service_spark.session import get_spark


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    qs = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        wanted = {q.strip() for q in only.split(",") if q.strip()}
        qs = {k: v for k, v in qs.items() if k in wanted}

    # warm the JVM + parquet footer caches once (not timed)
    entrymod.q01_job_statistics(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    # derived throughput on the ETL-shaped path (S4 flatten): rows/s at this sf
    flatten_rows = entrymod.q20_flatten_ingest(spark, sf_dir).count()
    t0 = time.perf_counter()
    materialize(entrymod.q20_flatten_ingest(spark, sf_dir))
    flatten_rps = round(flatten_rows / max(time.perf_counter() - t0, 1e-9), 1)

    print(
        json.dumps(
            {
                "metric": "sum_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "derived": {"flatten_rows_per_sec": flatten_rps, "reference_floor_rows_per_sec": 100},
            }
        )
    )


if __name__ == "__main__":
    main()
