"""Gopher-style repetition quality signals: planted repetitive docs
must be flagged, clean prose must pass, and the expression-only mode
count must match a Python model."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.repetition import repetition_signals


def _signals(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}


def test_planted_repetition_flagged(spark):
    clean = "the quick brown fox jumps over a lazy dog near the river bank today"
    spammy = "buy now " * 30  # one 2-gram repeated 30x
    single = "word word word word word word word word word word"
    out = _signals(spark, [(1, clean), (2, spammy), (3, single)])
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["dup_2gram_frac"] > 0.9
    assert out[3]["keep"] is False and out[3]["top_token_frac"] == 1.0


def test_signals_match_python_model(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    got = {
        r["doc_id"]: r
        for r in repetition_signals(docs).collect()
    }
    for row in docs.collect():
        toks = row["text"].lower().split()
        if not toks:
            assert row["doc_id"] not in got
            continue
        n = len(toks)
        counts = Counter(toks)
        grams = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
        g = got[row["doc_id"]]
        assert g["n_tokens"] == n
        assert abs(g["dup_token_frac"] - (1 - len(counts) / n)) < 1e-3
        assert abs(g["top_token_frac"] - max(counts.values()) / n) < 1e-3
        want_2g = (1 - len(set(grams)) / len(grams)) if grams else 0.0
        assert abs(g["dup_2gram_frac"] - want_2g) < 1e-3


def test_empty_and_whitespace_docs_excluded(spark):
    out = _signals(spark, [(1, ""), (2, "   "), (3, "ok fine")])
    assert set(out) == {3}


def test_signals_property_based(spark):
    """Hypothesis over synthetic token lists vs the exact Python model."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    TOK = st.integers(min_value=0, max_value=6)
    DOC = st.lists(TOK, min_size=1, max_size=40)

    @given(st.lists(DOC, min_size=1, max_size=6))
    @settings(
        max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
    )
    def inner(docs):
        rows = [(i, " ".join(f"w{x}" for x in toks)) for i, toks in enumerate(docs)]
        got = _signals(spark, rows)
        for i, toks in enumerate(docs):
            n = len(toks)
            counts = Counter(toks)
            grams = list(zip(toks, toks[1:]))
            g = got[i]
            assert g["n_tokens"] == n
            assert abs(g["dup_token_frac"] - (1 - len(counts) / n)) < 1e-3
            assert abs(g["top_token_frac"] - max(counts.values()) / n) < 1e-3
            want = (1 - len(set(grams)) / len(grams)) if grams else 0.0
            assert abs(g["dup_2gram_frac"] - want) < 1e-3

    inner()
