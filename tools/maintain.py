"""Lake maintenance CLI: compact small files, re-cluster with Z-order,
and drop a wide profile next to the table — the nightly-ops companion
to the reference service's shell utilities (monitor/backup), re-based
on this engine's operators.

    python tools/maintain.py TABLE_DIR \
        [--partition-cols day]            # compact_partitions per partition
        [--zorder colA,colB [--files N]]  # rewrite whole table z-clustered
        [--profile-cols colA,colB]        # write _PROFILE.json beside data
        [--profile-approx]                # HLL distincts (large tables)
        [--target-rows N]                 # compaction file sizing
        [--bucket-by col [--buckets N]]   # join-locality bucket layout

Emits ONE summary JSON line on stdout (the bench.py tail-capture
convention). Z-order rewrite uses the same stage-then-swap posture as
compact_partitions: the clustered copy is fully written to
``<dir>.zorder_staging`` before the live directory is swapped out, and
the previous data survives at ``<dir>.zorder_backup`` until the swap
completes. ``_PROFILE.json`` starts with an underscore, so parquet
readers ignore it (the Spark/Hadoop hidden-file convention).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zorder_rewrite(
    spark,
    path: str,
    cols: list[str],
    *,
    num_files: int,
    bits: int = 16,
    resolutions: dict[str, float] | None = None,
) -> dict:
    """Rewrite ``path`` as ``num_files`` z-clustered parquet files.
    Stage-then-swap: never deletes live data before the replacement is
    durable; a crash mid-swap leaves either the old dir, or the backup
    plus staged copy, never nothing.

    CONSTRAINTS (by design, for this CLI's single-box nightly-ops
    scope): the swap uses driver-local ``os.rename``/``shutil``, so
    ``path`` must be a LOCAL filesystem directory (HDFS/S3 need the
    Hadoop FileSystem API instead), there must be a SINGLE writer (the
    self-heal assumes any leftover state is its own crash, not a
    concurrent run), and there is a brief window between the two
    renames where no live directory exists — concurrent readers must
    retry (the crash self-heal covers a writer dying inside it)."""
    from usajobs_etl_service_spark.operators.layout import zorder_repartition

    staging = path.rstrip("/") + ".zorder_staging"
    backup = path.rstrip("/") + ".zorder_backup"
    # self-heal crash leftovers (a nightly cron retry must converge,
    # not page an operator): every crash point leaves a recoverable
    # combination — (backup + staging, no live dir) = killed between
    # the two renames -> finish the swap; (backup + live dir) = killed
    # before the backup cleanup -> drop the backup; (staging + live
    # dir) = killed before the swap started or staging is unverified
    # -> discard staging and rebuild it.
    if os.path.exists(backup) and os.path.exists(staging) and not os.path.exists(path):
        os.rename(staging, path)
        shutil.rmtree(backup)
    elif os.path.exists(backup) and os.path.exists(path):
        shutil.rmtree(backup)
    elif os.path.exists(backup) and not os.path.exists(path):
        os.rename(backup, path)  # staged copy never became live
    if os.path.exists(staging):
        shutil.rmtree(staging)
    df = spark.read.parquet(path)
    n_before = df.count()
    zcols = list(cols)
    prep_cols: list[str] = []
    if resolutions:
        # float/timestamp z-columns: fixed-point bucket via
        # zorder_prepare, cluster on the bucket, drop the helper
        # columns before write (the layout is carried by placement)
        from usajobs_etl_service_spark.operators.layout import zorder_prepare

        df, prep_names = zorder_prepare(df, resolutions)
        renamed = dict(zip(resolutions.keys(), prep_names))
        zcols = [renamed.get(c, c) for c in zcols]
        prep_cols = prep_names
    out = zorder_repartition(df, zcols, num_partitions=num_files, bits=bits)
    if prep_cols:
        out = out.drop(*prep_cols)
    out.write.parquet(staging)
    n_after = spark.read.parquet(staging).count()
    if n_after != n_before:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(f"staged rewrite row mismatch: {n_before} -> {n_after}")
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return {"rows": n_after, "files": num_files, "zorder_cols": cols}


def bucket_rewrite(spark, path: str, bucket_col: str, n_buckets: int) -> dict:
    """Rewrite ``path`` in bucketed layout (sinks/bucketed.py) with the
    zorder_rewrite stage-then-swap + self-heal discipline, and drop a
    ``_BUCKET_SPEC.json`` sidecar so any later session re-attaches the
    no-shuffle property via ``register_bucketed`` (Spark carries bucket
    ids in the ``part-*_NNNNN`` file names — they survive the swap).
    Same single-writer/local-filesystem scope as zorder_rewrite."""
    from usajobs_etl_service_spark.sinks.bucketed import (
        bucketize_write,
        write_bucket_spec,
    )

    staging = path.rstrip("/") + ".bucket_staging"
    backup = path.rstrip("/") + ".bucket_backup"
    if os.path.exists(backup) and os.path.exists(staging) and not os.path.exists(path):
        os.rename(staging, path)
        shutil.rmtree(backup)
    elif os.path.exists(backup) and os.path.exists(path):
        shutil.rmtree(backup)
    elif os.path.exists(backup) and not os.path.exists(path):
        os.rename(backup, path)
    if os.path.exists(staging):
        shutil.rmtree(staging)
    df = spark.read.parquet(path)
    n_before = df.count()
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    tmp_table = f"maintain_bucket_{os.getpid()}"
    bucketize_write(df, tmp_table, bucket_col, n_buckets, staging)
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    n_after = spark.read.parquet(staging).count()
    if n_after != n_before:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(f"staged rewrite row mismatch: {n_before} -> {n_after}")
    write_bucket_spec(staging, bucket_col, n_buckets, schema_ddl)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return {"rows": n_after, "bucket_col": bucket_col, "n_buckets": n_buckets}


def profile_to_file(
    spark, path: str, cols: list[str] | None, *, approx: bool = False
) -> dict:
    """``approx=True`` is the nightly-ops mode for LARGE tables: the
    exact wide profile plans k multi-column distincts through one
    Expand that multiplies every input row by (k+1) — at 100 TB
    that is petabytes through the aggregate; HLL distincts
    (profile_table(approx=True), ~5% rsd) keep the pass one plain
    mergeable scan. The sidecar records which mode produced it."""
    from usajobs_etl_service_spark.operators.profiling import profile_table

    df = spark.read.parquet(path)
    rows = profile_table(df, cols, approx=approx).collect()
    out = {
        "generated_unix": int(time.time()),
        "mode": "approx" if approx else "exact",
        "distinct_rsd": 0.05 if approx else 0.0,
        "n_rows": rows[0]["n_rows"] if rows else 0,
        "columns": {
            r["column"]: {
                "n_nulls": r["n_nulls"],
                "n_distinct": r["n_distinct"],
                "min": r["min_value"],
                "max": r["max_value"],
            }
            for r in rows
        },
    }
    with open(os.path.join(path, "_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)
    return {"profiled_columns": len(rows), "n_rows": out["n_rows"]}


def main(argv: list[str]) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("table_dir")
    ap.add_argument("--partition-cols", default=None)
    ap.add_argument("--zorder", default=None)
    ap.add_argument(
        "--zorder-resolution",
        default=None,
        help="fixed-point buckets for non-integral z-columns, e.g. "
        "'o_totalprice=0.01,o_orderdate=86400' (unit = the column's "
        "natural unit; timestamps bucket in seconds)",
    )
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--bits", type=int, default=16)
    ap.add_argument("--profile-cols", default=None)
    ap.add_argument("--do-profile", action="store_true")
    ap.add_argument(
        "--profile-approx",
        action="store_true",
        help="HLL distinct estimates (~5%% rsd) instead of exact — the "
        "right mode for a wide profile of a large table (the exact "
        "plan's Expand multiplies every row by n_cols+1)",
    )
    ap.add_argument("--target-rows", type=int, default=1_000_000)
    ap.add_argument(
        "--bucket-by",
        default=None,
        help="rewrite the table bucketed on this column (join-locality "
        "layout; records _BUCKET_SPEC.json for register_bucketed)",
    )
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args(argv)

    # ALL flag-combination validation happens BEFORE any side effect
    # (round-10 review: a bad --profile-approx combo used to surface
    # only after compaction and the z-order rewrite had already
    # mutated the table — and then exited without the summary line
    # the tail-capture contract depends on)
    if args.zorder_resolution and not args.zorder:
        # silently ignoring the flag would let an operator believe the
        # float column was re-clustered when nothing ran
        ap.error("--zorder-resolution requires --zorder")
    zcols = [c for c in args.zorder.split(",") if c] if args.zorder else []
    resolutions = None
    if args.zorder_resolution:
        resolutions = {
            k: float(v)
            for k, v in (
                kv.split("=", 1) for kv in args.zorder_resolution.split(",") if kv
            )
        }
        extras = sorted(set(resolutions) - set(zcols))
        if extras:
            # a resolution naming a non-z column would compute its
            # bucket helper, drop it unused, and report the float
            # column clustered when it never was (round-10 review)
            ap.error(
                f"--zorder-resolution columns {extras} are not in "
                f"--zorder ({zcols}); every resolution must name a "
                "z-order column"
            )
    if args.profile_approx and not (args.profile_cols or args.do_profile):
        ap.error("--profile-approx requires --profile-cols or --do-profile")
    if args.bucket_by and args.zorder:
        # one physical row order per table: z-order clusters for scan
        # locality, bucketing hashes for join locality — the last
        # writer would silently undo the other's layout
        ap.error("--bucket-by and --zorder are mutually exclusive layouts")
    if args.buckets < 1:
        ap.error("--buckets must be >= 1")

    from usajobs_etl_service_spark.session import get_spark

    spark = get_spark("maintain")
    summary: dict = {"table": args.table_dir}
    t0 = time.perf_counter()
    if args.partition_cols:
        from usajobs_etl_service_spark.sinks.partitioned import compact_partitions

        n = compact_partitions(
            spark,
            args.table_dir,
            partition_cols=[c for c in args.partition_cols.split(",") if c],
            target_rows_per_file=args.target_rows,
        )
        summary["compacted_partitions"] = n
    if args.zorder:
        summary["zorder"] = zorder_rewrite(
            spark,
            args.table_dir,
            zcols,
            num_files=args.files,
            bits=args.bits,
            resolutions=resolutions,
        )
    if args.bucket_by:
        summary["bucketed"] = bucket_rewrite(
            spark, args.table_dir, args.bucket_by, args.buckets
        )
    if args.profile_cols or args.do_profile:
        cols = [c for c in (args.profile_cols or "").split(",") if c] or None
        summary["profile"] = profile_to_file(
            spark, args.table_dir, cols, approx=args.profile_approx
        )
    summary["sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
