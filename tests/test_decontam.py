"""Benchmark decontamination: planted n-gram overlap must be caught,
clean docs kept, short docs never matched."""

from __future__ import annotations

from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.decontam import contaminated_docs, decontaminate


def _frames(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark 8-gram "quick brown fox jumps over the lazy dog"
            (1, "witnesses saw the QUICK brown fox jumps over the lazy dog yesterday evening"),
            # shares words but no 8-gram
            (2, "the quick brown fox sat still while the dog slept"),
            (3, "completely unrelated text about spark shuffle partitions and joins"),
            (4, "quick brown fox"),  # shorter than n -> can't match
        ],
        "doc_id long, text string",
    )
    return docs, bench


def test_planted_overlap_detected(spark):
    docs, bench = _frames(spark)
    bad = {r["doc_id"] for r in contaminated_docs(docs, bench, n=8).collect()}
    assert bad == {1}  # case-insensitive 8-gram hit; 2/3/4 clean


def test_decontaminate_removes_only_contaminated(spark):
    docs, bench = _frames(spark)
    kept = sorted(r["doc_id"] for r in decontaminate(docs, bench, n=8).collect())
    assert kept == [2, 3, 4]


def test_bench_self_overlap_is_total(spark):
    docs, bench = _frames(spark)
    bad = {r["doc_id"] for r in contaminated_docs(bench, bench, n=8).collect()}
    assert bad == {100}


def test_no_false_positives_on_real_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = spark.createDataFrame(
        [(0, "zqx wvu tsr qpo nml kji hgf edc baz yxw")], "doc_id long, text string"
    )
    assert contaminated_docs(docs, bench, n=8).count() == 0
