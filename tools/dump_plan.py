"""Dump ``explain("formatted")`` for named queries to files.

Usage: python tools/dump_plan.py <out_dir> <suffix> q170,q199,...

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query (full
registry name resolved by prefix). Used for the plans/r12/ before/
after evidence files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from usajobs_etl_service_spark.session import get_spark


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    spark = get_spark("dump_plan")
    for prefix in names:
        prefix = prefix.strip()
        matches = [k for k in qs if k == prefix or k.startswith(prefix + "_")]
        if not matches:
            print(f"no query matches {prefix!r}", file=sys.stderr)
            continue
        for name in matches:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
