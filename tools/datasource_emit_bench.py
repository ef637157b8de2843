"""Measure the Spark 4 Python DataSource Arrow-batch path against
row-at-a-time tuple yields at real row volume (VERDICT r4 #6).

q46's payload contract (1 JSON row per page) is worker-startup-bound —
Arrow cannot move it (TODO.md round-3 analysis). This bench gives the
same mock source real volume (500 items/page) and compares:

- ``emit=rows``       per-row tuples, pickle serialization
- ``emit=rows_arrow`` one pyarrow.RecordBatch per page

Results land in SCALE.md §Python DataSource.

Usage: python tools/datasource_emit_bench.py [total_rows]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from usajobs_etl_service_spark.session import get_spark
from usajobs_etl_service_spark.sources.datasource import register_rest_datasource


def main(total: int = 500_000) -> None:
    spark = get_spark("ds_emit_bench")
    register_rest_datasource(spark)
    pages = (total + 499) // 500

    def load(emit, ppp):
        return (
            spark.read.format("usajobs_rest")
            .option("mock_total", total)
            .option("results_per_page", 500)
            .option("max_pages", pages)
            .option("emit", emit)
            .option("pages_per_partition", ppp)
            .load()
        )

    # warm the Python worker pool + codegen once per mode (not timed)
    for emit in ("rows", "rows_arrow"):
        load(emit, 1).limit(1).collect()

    wide_ppp = max(pages // 32, 1)  # partitions sized to cluster width
    out = {}
    for emit in ("rows", "rows_arrow"):
        for ppp in (1, wide_ppp):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                load(emit, ppp).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[(emit, ppp)] = best
            print(f"emit={emit:11s} pages/part={ppp:3d}  {total} rows in {best:5.2f}s "
                  f"({total / best:,.0f} rows/s)")
    print(f"arrow speedup over tuples @1 page/part:  {out[('rows', 1)] / out[('rows_arrow', 1)]:.2f}x")
    print(f"arrow speedup over tuples @{wide_ppp} pages/part: {out[('rows', wide_ppp)] / out[('rows_arrow', wide_ppp)]:.2f}x")
    print(f"partition-sizing speedup (tuples): {out[('rows', 1)] / out[('rows', wide_ppp)]:.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
