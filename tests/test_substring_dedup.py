"""Cross-doc duplicated-substring detection (operators/substring_dedup).

Small-geometry truths a SQL oracle can't conveniently pin (span merge
edge cases) plus the q90 definition on constructed corpora:
- a shared L-token substring yields ONE maximal span of length L, not
  L - n + 1 windows,
- within-doc-only repetition does not count at min_docs=2,
- docs shorter than n produce no grams and no stats rows,
- dup_frac profile matches hand-computed values.
"""

from __future__ import annotations

from usajobs_etl_service_spark.operators.substring_dedup import (
    duplicated_gram_stats,
    duplicated_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_substring_merges_to_one_maximal_span(spark):
    """Docs 1 and 2 share a 6-token run; with n=3 that is 4 duplicated
    gram positions merging into one span of length 6 in each doc."""
    shared = "alpha beta gamma delta epsilon zeta"
    df = _df(
        spark,
        [
            (1, f"x1 x2 {shared} y1 y2"),
            (2, f"{shared} z1 z2 z3"),
            (3, "unrelated words only here nothing shared at all"),
        ],
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in duplicated_spans(df, n=3).collect()
    }
    assert spans == {1: (3, 8, 6), 2: (1, 6, 6)}


def test_disjoint_shared_runs_stay_separate_spans(spark):
    """Two shared runs separated by unshared tokens must NOT merge."""
    df = _df(
        spark,
        [
            (1, "a b c SEP1 SEP2 SEP3 d e f"),
            (2, "a b c OTHER1 OTHER2 OTHER3 d e f"),
        ],
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(df, n=3).collect()
    )
    assert spans == [(1, 1, 3), (1, 7, 9), (2, 1, 3), (2, 7, 9)]


def test_within_doc_repetition_not_cross_doc(spark):
    """A doc repeating its own 3-gram twice has no cross-doc dup."""
    df = _df(
        spark,
        [
            (1, "p q r p q r"),
            (2, "totally different words here"),
        ],
    )
    assert duplicated_spans(df, n=3).count() == 0


def test_short_docs_produce_no_rows(spark):
    df = _df(spark, [(1, "one two"), (2, "one two")])
    assert duplicated_spans(df, n=3).count() == 0
    assert duplicated_gram_stats(df, n=3).count() == 0


def test_exact_copies_fully_duplicated(spark):
    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = _df(spark, [(1, text), (2, text), (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")])
    stats = {r["doc_id"]: r for r in duplicated_gram_stats(df, n=8).collect()}
    # 10 tokens, n=8 -> 3 grams per doc, all duplicated in docs 1/2
    for d in (1, 2):
        assert stats[d]["n_grams"] == 3
        assert stats[d]["n_dup_grams"] == 3
        assert stats[d]["dup_frac"] == 1.0
    assert stats[3]["n_dup_grams"] == 0 and stats[3]["dup_frac"] == 0.0


def test_min_docs_threshold(spark):
    """min_docs=3: a gram in only 2 docs stops qualifying."""
    text = "a b c d e f g h"
    df = _df(spark, [(1, text), (2, text), (3, "x y z u v w q r")])
    assert duplicated_spans(df, n=8, min_docs=2).count() == 2
    assert duplicated_spans(df, n=8, min_docs=3).count() == 0


def test_realdata_near_dup_copies_detected(spark, sf_dir):
    """The driver corpus plants near-dup copies (base text + ' dup'):
    each such pair shares the base's full 8-gram run, so both members
    must surface with a span covering >= the base length - growth only
    from coincidental vocabulary overlap, never less."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    spans = duplicated_spans(docs, n=8)
    # every span is within its doc's token bounds and >= n long
    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.functions.text import token_count_ws

    joined = spans.join(
        docs.select("doc_id", token_count_ws(F.lower(F.col("text"))).alias("ntok")),
        "doc_id",
    )
    bad = joined.filter(
        (F.col("span_len") < 8)
        | (F.col("span_start") < 1)
        | (F.col("span_end") > F.col("ntok"))
    )
    assert spans.count() > 0
    assert bad.count() == 0
