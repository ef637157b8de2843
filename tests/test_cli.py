"""E1 CLI entry point (reference main(), etl.py:695-714): one-command
run, env/flag config, exit codes, idempotent re-run."""

from __future__ import annotations

import json

from usajobs_etl_service_spark.__main__ import demo_transport, main


def test_cli_one_shot_success(spark, tmp_path, capsys):
    tbl = str(tmp_path / "tbl")
    rc = main(["--table-path", tbl, "--demo-jobs", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "success"
    assert out["jobs_extracted"] == 8
    assert (out["inserted"], out["updated"]) == (8, 0)
    assert spark.read.parquet(tbl + "/v=*").count() == 8


def test_cli_second_run_updates(spark, tmp_path, capsys):
    tbl = str(tmp_path / "tbl")
    assert main(["--table-path", tbl, "--demo-jobs", "5"]) == 0
    assert main(["--table-path", tbl, "--demo-jobs", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (out["inserted"], out["updated"]) == (0, 5)


def test_cli_schedule_loop_runs_n_times(spark, tmp_path, capsys):
    tbl = str(tmp_path / "tbl")
    rc = main(["--table-path", tbl, "--demo-jobs", "3", "--interval-seconds", "0", "--runs", "2"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 2


def test_demo_transport_paginates_and_exhausts():
    t = demo_transport(total_jobs=7, page_size=10)
    p1 = t({"Page": 1, "ResultsPerPage": 3})["SearchResult"]
    assert p1["SearchResultCount"] == 3 and p1["SearchResultCountAll"] == 7
    p3 = t({"Page": 3, "ResultsPerPage": 3})["SearchResult"]
    assert p3["SearchResultCount"] == 1  # partial page -> scan stops
