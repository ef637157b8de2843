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


def test_contamination_fraction_graded(spark):
    """Hand-check: doc 1 shares exactly half its distinct 3-grams with
    the benchmark; doc 2 shares none; a short doc has no grams and no
    output row."""
    from usajobs_etl_service_spark.operators.decontam import contamination_fraction

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),  # grams: abc bcd cde
            (2, "x y z w"),    # grams: xyz yzw
            (3, "t u"),        # too short
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, "a b c d q")], "doc_id long, text string")
    # bench grams: abc, bcd, cdq -> doc1 hits abc+bcd (2/3), doc2 none
    got = {r["doc_id"]: r for r in contamination_fraction(docs, bench, n=3).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_grams"] == 3 and got[1]["n_hit"] == 2
    assert got[1]["contam_frac"] == round(2 / 3, 6)
    assert got[2]["n_hit"] == 0 and got[2]["contam_frac"] == 0.0


def test_contamination_fraction_counts_distinct_grams_once(spark):
    """A repeated gram inside one document counts once (distinct
    grams), so repetition cannot dilute or inflate the fraction."""
    from usajobs_etl_service_spark.operators.decontam import contamination_fraction

    docs = spark.createDataFrame(
        [(1, "a b a b a b")],  # distinct 3-grams: aba, bab
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "a b a")], "doc_id long, text string")
    got = contamination_fraction(docs, bench, n=3).collect()[0]
    assert got["n_grams"] == 2 and got["n_hit"] == 1
    assert got["contam_frac"] == 0.5


def test_novelty_first_seen_attribution(spark):
    from usajobs_etl_service_spark.operators.decontam import novelty_profile

    # doc 1 introduces "a b c" and "b c d"; doc 2 repeats "a b c" (not
    # novel there) and introduces "c d e" via its tail; doc 3 is a pure
    # copy of doc 1 — zero novelty.
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # grams: abc, bcd -> both novel
            (2, "a b c e"),      # grams: abc (seen), bce (novel)
            (3, "a b c d"),      # grams: abc, bcd -> both first seen in doc 1
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_frac"])
           for r in novelty_profile(docs, n=3).collect()}
    assert got == {1: (2, 2, 1.0), 2: (2, 1, 0.5), 3: (2, 0, 0.0)}


def test_novelty_short_docs_absent_and_dup_grams_once(spark):
    from usajobs_etl_service_spark.operators.decontam import novelty_profile

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "x y x y x y")],  # doc 1: no 3-grams; doc 2: 2 distinct
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"]) for r in novelty_profile(docs, n=3).collect()}
    assert got == {2: (2, 2)}
