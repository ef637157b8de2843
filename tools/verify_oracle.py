"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count, column names, and order-insensitive
values (floats compared after rounding at display precision).

Usage::

    python tools/verify_oracle.py [sf_dir] [--queries q01_stats q03_...]
    python tools/verify_oracle.py --sf-dir /root/testdata/sf0.1

``sf_dir`` defaults to ``/root/testdata/sf0.01`` (the driver's gate
SF); unknown flags are rejected loudly (argparse), and bare query
names may also trail the positional sf_dir for back-compat.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from usajobs_etl_service_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(name: str, spark, con, sf_dir: str) -> str:
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        return f"SKIP (no oracle) rows={len(srows)}"
    ocols = [d[0] for d in con.execute(sql).description]
    orows = con.execute(sql).fetchall()
    sc, sr = _norm_rows(scols, srows)
    oc, orr = _norm_rows(ocols, orows)
    if sc != oc:
        return f"FAIL cols: spark={sc} oracle={oc}"
    if len(sr) != len(orr):
        return f"FAIL rowcount: spark={len(sr)} oracle={len(orr)}"
    if sr != orr:
        for a, b in zip(sr, orr):
            if a != b:
                return f"FAIL values: first diff spark={a!r} oracle={b!r}"
        return "FAIL values: (order)"
    return f"OK rows={len(sr)}"


def main():
    ap = argparse.ArgumentParser(
        description="Run queries() vs oracle_sql() side-by-side and compare."
    )
    ap.add_argument(
        "sf_dir",
        nargs="?",
        default="/root/testdata/sf0.01",
        help="testdata scale-factor dir (default: %(default)s)",
    )
    ap.add_argument(
        "names",
        nargs="*",
        metavar="query",
        help="query names to check (default: the full registry)",
    )
    ap.add_argument(
        "--sf-dir",
        dest="sf_dir_flag",
        default=None,
        help="alternative spelling of the positional sf_dir",
    )
    ap.add_argument(
        "--queries",
        nargs="+",
        default=None,
        metavar="NAME",
        help="query names to check (same as trailing positionals)",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir_flag or args.sf_dir
    extra_names = []
    if args.sf_dir_flag is not None and args.sf_dir != ap.get_default("sf_dir"):
        # --sf-dir plus a trailing positional: argparse bound the FIRST
        # trailing name to the positional sf_dir slot. Reclaim it as a
        # query name (validated against the registry below) instead of
        # silently dropping it — unless it's a second, conflicting dir.
        if os.path.isdir(args.sf_dir):
            ap.error(
                f"conflicting sf_dir specifications: positional "
                f"{args.sf_dir!r} and --sf-dir {args.sf_dir_flag!r}"
            )
        extra_names = [args.sf_dir]
    if not os.path.isdir(sf_dir):
        ap.error(f"sf_dir is not a directory: {sf_dir!r}")
    registry = entrymod.queries()
    names = (args.queries or []) + extra_names + args.names or list(registry)
    unknown = [n for n in names if n not in registry]
    if unknown:
        ap.error(
            f"unknown query name(s): {unknown}; registry has {len(registry)}"
        )
    spark = get_spark("verify_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name in names:
        try:
            result = compare(name, spark, con, sf_dir)
        except Exception as e:
            result = f"ERROR {type(e).__name__}: {str(e)[:300]}"
        if not result.startswith(("OK", "SKIP")):
            failures += 1
        print(f"{name:32s} {result}")
    print(f"\n{len(names) - failures}/{len(names)} passing")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
