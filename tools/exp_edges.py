"""Round-12 experiment: cost of the co-purchase edge derivation and a
lower-shuffle variant (groupBy+collect_set+pair-explode vs self-join).
Diagnostic only — not part of the engine."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from usajobs_etl_service_spark.session import get_spark, read_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("exp_edges")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, n=3):
    fn()  # warm-up
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:36s} median {sorted(ts)[n//2]:.3f}s  min {min(ts):.3f}")


li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")


def current():
    d = li.distinct()
    a = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    noop(e)


def collect_set_variant():
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x: F.filter(
                        F.transform(F.col("ps"), lambda y: F.struct(x.alias("u"), y.alias("v"))),
                        lambda st: st["u"] < st["v"],
                    ),
                )
            )
        ).alias("p")
    ).select("p.u", "p.v")
    noop(pairs.distinct())


def counts():
    d = li.distinct()
    a = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    print("lineitem rows:", li.count(), " distinct (ok,pk):", d.count(), " edges:", e.count())


counts()
timeit("A self-join (current)", current)
timeit("B collect_set+explode", collect_set_variant)
