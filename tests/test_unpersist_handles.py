"""Round-13 (VERDICT r12 #2 / ADVICE): operators that persist
multi-consumer intermediates and return lazy frames must let callers
release those caches via ``unpersist_handle`` — the semdedup pattern,
extended to every round-12 persist site. See operators/__init__ for
the central lifecycle statement.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from usajobs_etl_service_spark.session import read_table


def _release(handle):
    for df in handle:
        df.unpersist()


def _assert_all_cached_then_released(handle):
    assert handle, "operator did not report its persisted frames"
    for df in handle:
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
    _release(handle)
    for df in handle:
        assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)


def test_association_rules_handle(spark, sf_dir):
    from usajobs_etl_service_spark.operators.association import association_rules

    li = read_table(spark, sf_dir, "lineitem")
    handle = []
    out = association_rules(
        li, "l_orderkey", "l_partkey", unpersist_handle=handle
    )
    out.write.format("noop").mode("overwrite").save()
    _assert_all_cached_then_released(handle)


def test_bigram_lm_scores_handle(spark, sf_dir):
    from usajobs_etl_service_spark.operators.retrieval import bigram_lm_scores

    docs = read_table(spark, sf_dir, "documents").limit(50)
    handle = []
    bigram_lm_scores(docs, unpersist_handle=handle).write.format("noop").mode(
        "overwrite"
    ).save()
    assert len(handle) == 3  # base, trans, unigrams
    _assert_all_cached_then_released(handle)


def test_kneser_ney_scores_handle(spark, sf_dir):
    from usajobs_etl_service_spark.operators.retrieval import kneser_ney_scores

    docs = read_table(spark, sf_dir, "documents").limit(50)
    handle = []
    kneser_ney_scores(docs, unpersist_handle=handle).write.format("noop").mode(
        "overwrite"
    ).save()
    assert len(handle) == 2  # trans, bigrams
    _assert_all_cached_then_released(handle)


def test_hashed_linear_score_handle(spark, sf_dir):
    from usajobs_etl_service_spark.operators.classifier import hashed_linear_score

    docs = read_table(spark, sf_dir, "documents").limit(50)
    weights = spark.createDataFrame(
        [(i, 0.1) for i in range(8)], "bucket int, weight double"
    )
    handle = []
    hashed_linear_score(
        docs, weights, width=8, unpersist_handle=handle
    ).write.format("noop").mode("overwrite").save()
    assert len(handle) == 1  # the shared tokenize base (bigrams=True)
    _assert_all_cached_then_released(handle)

    # single-leg form persists nothing -> handle stays empty
    handle2 = []
    hashed_linear_score(
        docs, weights, width=8, bigrams=False, unpersist_handle=handle2
    ).write.format("noop").mode("overwrite").save()
    assert handle2 == []


def test_containment_pairs_handle(spark, sf_dir):
    from usajobs_etl_service_spark.operators.neardup import containment_pairs

    docs = read_table(spark, sf_dir, "documents").limit(50)
    handle = []
    containment_pairs(
        docs, threshold=0.5, unpersist_handle=handle
    ).write.format("noop").mode("overwrite").save()
    assert len(handle) == 2  # grams, kept
    _assert_all_cached_then_released(handle)


def test_handles_do_not_change_results(spark, sf_dir):
    from usajobs_etl_service_spark.operators.retrieval import kneser_ney_scores

    docs = read_table(spark, sf_dir, "documents").limit(30)
    handle = []
    with_handle = kneser_ney_scores(docs, unpersist_handle=handle)
    without = kneser_ney_scores(docs)
    rows_a = sorted(map(tuple, with_handle.collect()))
    rows_b = sorted(map(tuple, without.collect()))
    assert rows_a == rows_b
    _release(handle)
    spark.catalog.clearCache()  # release `without`'s untracked persists
