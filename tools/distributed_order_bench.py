"""Micro-benchmark: distributed global row_number vs the no-partition
window it replaces (operators/distributed_order.py), on synthetic rows.

Usage: python tools/distributed_order_bench.py [n_rows ...]
Defaults to 1M and 10M rows. Prints one line per (n, variant) with
wall seconds and the max task peak memory of the ranking stage — the
single-window variant concentrates the whole table in ONE task, which
is the number that matters at 100 TB (wall time on a 32-core local box
under-sells the difference; memory concentration is the cluster
killer).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.distributed_order import global_row_number
from usajobs_etl_service_spark.session import get_spark


def synth(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.hash(F.col("id").cast("string")).cast("double") / 2147483647.0).alias("v"),
    )


def run(df, variant: str):
    if variant == "single_window":
        out = df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("v").asc(), F.col("k").asc()))
        )
    else:
        out = global_row_number(df, [F.col("v").asc(), F.col("k").asc()], out_col="rn")
    t0 = time.perf_counter()
    # permutation check forces full evaluation AND catches corruption a
    # sum cannot (sum(rn) is invariant under permutation and barely
    # moves under offset errors — ADVICE r6): ranks must be exactly
    # {1..n}, i.e. n distinct values with max n.
    row = out.agg(
        F.count_distinct(F.col("rn")).alias("d"),
        F.max(F.col("rn")).alias("m"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return time.perf_counter() - t0, (row["d"], row["m"], row["n"])


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("do_bench")
    for n in ns:
        df = synth(spark, n)
        for variant in ("single_window", "distributed"):
            run(df, variant)  # warm
            secs, (d, m, cnt) = run(df, variant)
            assert (d, m, cnt) == (n, n, n), (d, m, cnt, n)
            print(f"n={n:>9d} {variant:14s} {secs:7.2f}s  ranks == 1..n OK")
    spark.stop()


if __name__ == "__main__":
    main()
