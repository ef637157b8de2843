"""Parquet bloom-filter row-group pruning (P6/P7 scale path): point
lookups on hash-ordered keys must skip row groups the key can't be in.
Smaller-scale version of tools/bloom_pruning_demo.py (2M-row numbers in
PLANS.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tools.bloom_pruning_demo import run, scan_output_rows, total_row_groups
from usajobs_etl_service_spark.operators.textindex import build_inverted_index, search_all_terms, write_posting_table


def test_bloom_prunes_row_groups(spark, tmp_path):
    out = run(spark, str(tmp_path), n_rows=200_000)
    assert out["plain_row_groups"] > 10  # enough groups for pruning to matter
    assert out["plain_scan_rows"] == out["n_rows"]  # min/max stats: no pruning
    assert out["bloom_scan_rows"] < out["n_rows"] / 10  # bloom: most groups skipped


def test_posting_table_written_with_bloom_prunes(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = build_inverted_index(docs)
    path = str(tmp_path / "postings")
    write_posting_table(idx, path, n_files=4)

    stored = spark.read.parquet(path)
    # index search over the materialized table matches the in-memory one
    want = {r["doc_id"] for r in search_all_terms(idx, ["data"]).collect()}
    got = {r["doc_id"] for r in search_all_terms(stored, ["data"]).collect()}
    assert got == want and len(got) > 0

    # pruning evidence: a single-term probe of the materialized table
    # must read fewer rows than the table holds (terms are unsorted, so
    # min/max stats can't do this — only the bloom can)
    total = stored.count()
    probed = scan_output_rows(stored.filter(F.col("term") == "data"))
    assert probed < total * 0.6, f"term probe read {probed}/{total} rows — bloom not pruning"
