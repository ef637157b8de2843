"""tools/maintain.py: z-order rewrite (stage-then-swap, data-identical,
measurably clustered), profile sidecar, crash-leftover fail-fast."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tools.maintain import profile_to_file, zorder_rewrite


def _write_grid(spark, path, n=32, files=4):
    (
        spark.range(n * n)
        .select((F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
        .repartition(files)
        .write.parquet(path)
    )


def test_zorder_rewrite_identical_rows_and_clustered(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_grid(spark, path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    out = zorder_rewrite(spark, path, ["x", "y"], num_files=8, bits=5)
    assert out["rows"] == len(before)
    after = sorted(tuple(r) for r in spark.read.parquet(path).select("x", "y").collect())
    assert after == before
    # no staging/backup residue
    assert not os.path.exists(path + ".zorder_staging")
    assert not os.path.exists(path + ".zorder_backup")
    # clustered: per-file y-ranges are fractional, not full-span
    from pyspark.sql.functions import input_file_name

    ranges = (
        spark.read.parquet(path)
        .select("y", input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
        .collect()
    )
    avg = sum((r["hi"] - r["lo"]) / 31.0 for r in ranges) / len(ranges)
    assert avg < 0.6, avg


def test_zorder_rewrite_self_heals_crash_leftovers(spark, tmp_path):
    """Every crash point must converge on retry: stale staging is
    discarded; a swap killed between the two renames (backup+staging,
    live dir gone) is completed; a backup orphaned after a completed
    swap is dropped."""
    import shutil

    # (a) stale staging beside a live dir -> discarded, rewrite succeeds
    path = str(tmp_path / "t2")
    _write_grid(spark, path)
    os.makedirs(path + ".zorder_staging")
    out = zorder_rewrite(spark, path, ["x", "y"], num_files=4)
    assert out["rows"] == 32 * 32
    assert not os.path.exists(path + ".zorder_staging")

    # (b) killed between renames: live dir missing, backup + staged copy
    pb = str(tmp_path / "t2b")
    _write_grid(spark, pb)
    os.rename(pb, pb + ".zorder_backup")
    shutil.copytree(pb + ".zorder_backup", pb + ".zorder_staging")
    out = zorder_rewrite(spark, pb, ["x", "y"], num_files=4)
    assert out["rows"] == 32 * 32
    assert spark.read.parquet(pb).count() == 32 * 32
    assert not os.path.exists(pb + ".zorder_backup")

    # (c) backup orphaned after a completed swap -> dropped on retry
    pc = str(tmp_path / "t2c")
    _write_grid(spark, pc)
    shutil.copytree(pc, pc + ".zorder_backup")
    zorder_rewrite(spark, pc, ["x", "y"], num_files=4)
    assert not os.path.exists(pc + ".zorder_backup")


def test_profile_sidecar_is_hidden_from_readers(spark, tmp_path):
    path = str(tmp_path / "t3")
    _write_grid(spark, path)
    out = profile_to_file(spark, path, ["x", "y"])
    assert out == {"profiled_columns": 2, "n_rows": 32 * 32}
    sidecar = json.load(open(os.path.join(path, "_PROFILE.json")))
    assert sidecar["columns"]["x"]["n_distinct"] == 32
    assert sidecar["columns"]["y"]["min"] == "0"
    # underscore-prefixed file is invisible to the parquet reader
    assert spark.read.parquet(path).count() == 32 * 32


def test_zorder_rewrite_with_resolutions_floats(spark, tmp_path):
    """--zorder-resolution path: a double price column z-orders via its
    fixed-point bucket; rows are identical, the helper _zb column does
    NOT leak into the written table, and price is measurably
    clustered per file."""
    path = str(tmp_path / "t_res")
    (
        spark.range(1024)
        .select(
            ((F.col("id") * 37 % 1000) / 10.0).alias("price"),
            (F.col("id") % 50).alias("k"),
        )
        .repartition(4)
        .write.parquet(path)
    )
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    out = zorder_rewrite(
        spark, path, ["price", "k"], num_files=8, bits=6,
        resolutions={"price": 0.1},
    )
    assert out["rows"] == len(before)
    got = spark.read.parquet(path)
    assert set(got.columns) == {"price", "k"}  # no _zb leak
    assert sorted(tuple(r) for r in got.collect()) == before
    from pyspark.sql.functions import input_file_name

    ranges = (
        got.select("price", input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("price").alias("lo"), F.max("price").alias("hi"))
        .collect()
    )
    avg = sum((r["hi"] - r["lo"]) / 99.9 for r in ranges) / len(ranges)
    assert avg < 0.7, avg


def test_cli_rejects_resolution_for_non_zorder_column(spark, tmp_path):
    """Round-10 review finding: a --zorder-resolution entry naming a
    column NOT in --zorder computed its bucket helper, dropped it
    unused, and reported the float column clustered when it never was.
    The CLI now fails fast on extras (and still requires --zorder)."""
    from tools.maintain import main

    path = str(tmp_path / "t_extra")
    _write_grid(spark, path)
    with pytest.raises(SystemExit):
        main([path, "--zorder", "x", "--zorder-resolution", "y=0.5"])
    with pytest.raises(SystemExit):
        main([path, "--zorder-resolution", "x=0.5"])  # no --zorder at all
    # the table was never rewritten by either failed invocation
    assert not os.path.exists(path + ".zorder_staging")
    assert not os.path.exists(path + ".zorder_backup")


def test_profile_sidecar_approx_mode(spark, tmp_path):
    """--profile-approx sidecar: HLL distinct estimates must be present
    (never NULL) for every orderable column, within ~5% rsd of exact,
    and the sidecar records which mode produced it — so a consumer can
    tell an estimate from a count (round-9 verdict item)."""
    path = str(tmp_path / "t_prof_approx")
    _write_grid(spark, path)
    exact = profile_to_file(spark, path, ["x", "y"])
    with open(os.path.join(path, "_PROFILE.json")) as f:
        exact_doc = json.load(f)
    assert exact_doc["mode"] == "exact" and exact_doc["distinct_rsd"] == 0.0
    out = profile_to_file(spark, path, ["x", "y"], approx=True)
    assert out["profiled_columns"] == exact["profiled_columns"] == 2
    with open(os.path.join(path, "_PROFILE.json")) as f:
        doc = json.load(f)
    assert doc["mode"] == "approx" and doc["distinct_rsd"] == 0.05
    for col, stats in doc["columns"].items():
        assert stats["n_distinct"] is not None, col
        exact_nd = exact_doc["columns"][col]["n_distinct"]
        assert abs(stats["n_distinct"] - exact_nd) <= max(3, 0.15 * exact_nd), col
        # extrema and null counts stay exact in approx mode
        assert stats["min"] == exact_doc["columns"][col]["min"]
        assert stats["max"] == exact_doc["columns"][col]["max"]
        assert stats["n_nulls"] == exact_doc["columns"][col]["n_nulls"]
    # CLI: --profile-approx without a profile request is an error
    from tools.maintain import main

    with pytest.raises(SystemExit):
        main([path, "--profile-approx"])


def test_bucket_rewrite_register_and_no_shuffle(spark, tmp_path):
    """--bucket-by layout: rows survive, the sidecar records the spec,
    and a RE-REGISTERED table (fresh catalog entry over the swapped
    files) still aggregates on the bucket key with ZERO Exchange —
    proving the bucket ids ride the file names across the swap."""
    from tools.maintain import bucket_rewrite
    from usajobs_etl_service_spark.sinks.bucketed import (
        SPEC_FILE,
        register_bucketed,
    )

    path = str(tmp_path / "t")
    spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(path)
    before = spark.read.parquet(path).groupBy().agg(F.sum("v")).first()[0]

    out = bucket_rewrite(spark, path, "k", 8)
    assert out == {"rows": 10_000, "bucket_col": "k", "n_buckets": 8}
    assert os.path.exists(os.path.join(path, SPEC_FILE))

    t = register_bucketed(spark, "t_reattached", path)
    assert t.groupBy().agg(F.sum("v")).first()[0] == before
    g = t.groupBy("k").agg(F.sum("v").alias("s"))
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:900]
    assert g.count() == 500
    spark.sql("DROP TABLE IF EXISTS t_reattached")


def test_cli_bucket_by(spark, tmp_path, capsys):
    from tools.maintain import main

    path = str(tmp_path / "t2")
    spark.range(1000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    ).write.parquet(path)
    main([path, "--bucket-by", "k", "--buckets", "4"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["bucketed"] == {"rows": 1000, "bucket_col": "k", "n_buckets": 4}


def test_cli_bucket_zorder_mutually_exclusive(spark, tmp_path):
    from tools.maintain import main

    path = str(tmp_path / "t3")
    spark.range(10).select(F.col("id").alias("k")).write.parquet(path)
    with pytest.raises(SystemExit):
        main([path, "--bucket-by", "k", "--zorder", "k"])
