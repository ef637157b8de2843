"""Split each declared query's warm cost into CONSTRUCTION (the
``fn(spark, sf_dir)`` call — py4j plan building plus any eager
construction-time jobs like anchor/codebook collects) vs EXECUTION
(the noop materialization of the returned frame).

Usage: python tools/profile_split.py [sf_dir] [q1,q2,...]

Writes PROFILE_SPLIT.json next to the repo root: per query
{build_sec, exec_sec} (median of 3 warm repeats after one untimed
warm-up — the bench.py protocol, halved). Guide §1: measure first;
this is the instrument that tells whether a sub-second query's cost
is data movement (optimize the plan) or fixed overhead (optimize
construction: literal-tree size, eager probes, job count).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from usajobs_etl_service_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qs = entrymod.queries()
    if len(sys.argv) > 2:
        wanted = {q.strip() for q in sys.argv[2].split(",") if q.strip()}
        qs = {k: v for k, v in qs.items() if k in wanted}
    spark = get_spark("profile_split")
    entrymod.q01_job_statistics(spark, sf_dir).count()  # session warm-up

    out: dict[str, dict[str, float]] = {}
    for name, fn in qs.items():
        # untimed warm-up (plan compile + codegen + footer caches)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:  # pragma: no cover - diagnostic tool
            out[name] = {"error": f"{type(ex).__name__}: {ex}"}
            continue
        builds, execs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        out[name] = {
            "build_sec": round(sorted(builds)[1], 3),
            "exec_sec": round(sorted(execs)[1], 3),
        }
        print(
            f"{name:42s} build {out[name]['build_sec']:7.3f}  exec {out[name]['exec_sec']:7.3f}",
            flush=True,
        )

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PROFILE_SPLIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    tot_b = sum(v.get("build_sec", 0.0) for v in out.values())
    tot_e = sum(v.get("exec_sec", 0.0) for v in out.values())
    print(json.dumps({"total_build_sec": round(tot_b, 1), "total_exec_sec": round(tot_e, 1), "n": len(out)}))


if __name__ == "__main__":
    main()
