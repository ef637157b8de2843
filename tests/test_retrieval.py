"""Semantic unit tests for ranked retrieval / corpus-statistics
operators (operators/retrieval.py) and blocked fuzzy edit-distance
dedup (operators/neardup.edit_distance_near_dup_pairs). Cross-engine
value equality is covered by the q91-q96 oracle-parity rows; these
pin the operator semantics themselves on hand-checkable corpora."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.neardup import edit_distance_near_dup_pairs
from usajobs_etl_service_spark.operators.retrieval import (
    bm25_scores,
    pmi_collocations,
    unigram_lm_scores,
    zipf_fit,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_tf_and_idf_direction(spark):
    # d1 mentions the query term twice, d2 once, d3 never; filler is
    # shared so doc lengths stay comparable.
    docs = _docs(
        spark,
        [
            (1, "spark spark filler filler"),
            (2, "spark filler filler filler"),
            (3, "other filler filler filler"),
        ],
    )
    got = {r["doc_id"]: r for r in bm25_scores(docs, ["spark"]).collect()}
    assert set(got) == {1, 2}, "docs without any query term must not appear"
    assert got[1]["bm25"] > got[2]["bm25"]
    assert got[1]["n_terms_matched"] == 1


def test_bm25_matches_hand_formula(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a a b b"), (3, "b b")])
    # N=3 docs, avgdl=(2+4+2)/3; term 'a': df=2.
    n, avgdl, k1, b = 3.0, 8.0 / 3.0, 1.2, 0.75
    idf = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["a"]).collect()}
    assert got[1] == round(score(1, 2), 6)
    assert got[2] == round(score(2, 4), 6)


def test_bm25_rejects_empty_query(spark):
    docs = _docs(spark, [(1, "a")])
    try:
        bm25_scores(docs, ["", " "])
    except ValueError:
        pass
    else:
        raise AssertionError("empty query must raise")


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    # 'common' dominates the corpus; the all-rare doc must be more
    # surprising than the all-common doc.
    docs = _docs(
        spark,
        [
            (1, "common common common common common common common common"),
            (2, "rare1 rare2 rare3 rare4"),
        ],
    )
    got = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    assert got[2]["surprisal_nats"] > got[1]["surprisal_nats"]
    assert got[1]["n_tokens"] == 8 and got[2]["n_tokens"] == 4
    # Hand value: each rare token has count 1 of T=12 -> ln(12).
    assert got[2]["surprisal_nats"] == round(math.log(12.0), 4)


def test_pmi_prefers_exclusive_pairs(spark):
    # 'x y' always co-occur (only with each other); 'a b' occur in many
    # other contexts too -> PMI(x,y) > PMI(a,b).
    rows = [(i, "x y") for i in range(25)]
    rows += [(100 + i, "a b") for i in range(25)]
    rows += [(200 + i, "a c b d") for i in range(25)]
    docs = _docs(spark, rows)
    got = {(r["a"], r["b"]): r for r in pmi_collocations(docs, min_count=20, top_k=10).collect()}
    assert ("x", "y") in got and ("a", "b") in got
    assert got[("x", "y")]["pmi"] > got[("a", "b")]["pmi"]
    assert got[("x", "y")]["c_ab"] == 25
    # rank 1 is the highest-PMI pair
    assert min(r["rank"] for r in got.values()) == 1


def test_zipf_slope_on_exact_power_law(spark):
    # term_r repeated floor(1000/r) times -> ln(freq) ~ -1 * ln(rank).
    rows = []
    did = 0
    for r in range(1, 21):
        for _ in range(1000 // r):
            rows.append((did, f"term{r:02d}"))
            did += 1
    docs = _docs(spark, rows)
    row = zipf_fit(docs, min_count=1).collect()[0]
    assert row["n_terms"] == 20
    assert -1.02 < row["zipf_slope"] < -0.98


def test_edit_distance_blocked_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delXa epsilon"),  # 1 edit, same block
            (3, "alpha beta gamma zzzzzzzzzzzzzz"),  # same block, far
            (4, "other beta gamma delta epsilon"),  # different block
        ],
        "id long, t string",
    )
    pairs = edit_distance_near_dup_pairs(
        df,
        id_col="id",
        key_col=F.col("t"),
        block_cols=[F.split_part(F.col("t"), F.lit(" "), F.lit(1))],
        max_dist=2,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in pairs}
    assert got == {(1, 2): 1}, got


def test_edit_distance_threshold_is_exact_on_kept_rows(spark):
    # dist must be the true edit distance (not a flag) for kept pairs.
    df = spark.createDataFrame(
        [(1, "b kitten"), (2, "b sitten"), (3, "b sitting"), (4, "b kitten")],
        "id long, t string",
    )
    pairs = edit_distance_near_dup_pairs(
        df,
        id_col="id",
        key_col=F.col("t"),
        block_cols=[F.split_part(F.col("t"), F.lit(" "), F.lit(1))],
        max_dist=2,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in pairs}
    # kitten->sitten: 1 sub; sitten->sitting: sub + insert = 2;
    # kitten->sitting: the textbook 3 -> dropped by the threshold.
    assert got[(1, 2)] == 1 and got[(2, 3)] == 2
    assert got[(1, 4)] == 0 and got[(2, 4)] == 1
    assert (1, 3) not in got and (3, 4) not in got  # dist 3 dropped

def test_bigram_lm_hand_computed(spark):
    """Full hand-check of the interpolated bigram surprisal on a
    2-document corpus (lam=0.75): unigrams a:4 b:2 (T=6), bigrams
    (a,b):2 (b,a):1 (a,a):1."""
    from usajobs_etl_service_spark.operators.retrieval import bigram_lm_scores

    docs = _docs(spark, [(1, "a b a b"), (2, "a a")])
    got = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    lam = 0.75
    p_ab = lam * 2 / 4 + (1 - lam) * 2 / 6
    p_ba = lam * 1 / 2 + (1 - lam) * 4 / 6
    p_aa = lam * 1 / 4 + (1 - lam) * 4 / 6
    d1 = (-math.log(4 / 6) - 2 * math.log(p_ab) - math.log(p_ba)) / 4
    d2 = (-math.log(4 / 6) - math.log(p_aa)) / 2
    assert got[1]["surprisal_nats"] == round(d1, 4)
    assert got[2]["surprisal_nats"] == round(d2, 4)
    assert got[1]["n_tokens"] == 4 and got[2]["n_tokens"] == 2


def test_bigram_lm_single_token_doc(spark):
    """A 1-token document has no transitions — it scores under the
    unigram term alone, and must not be dropped."""
    from usajobs_etl_service_spark.operators.retrieval import bigram_lm_scores

    docs = _docs(spark, [(1, "z"), (2, "z q")])
    got = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    # corpus unigrams: z:2 q:1 (T=3)
    assert got[1]["n_tokens"] == 1
    assert got[1]["surprisal_nats"] == round(-math.log(2 / 3), 4)


def test_bigram_lm_flags_repetitive_transitions(spark):
    """Two documents with the SAME unigram distribution: the one with
    predictable transitions scores strictly lower — the failure mode
    of the order-1 score this operator exists to catch."""
    from usajobs_etl_service_spark.operators.retrieval import bigram_lm_scores

    docs = _docs(
        spark,
        [
            (1, "a b a b a b a b a b a b"),  # fully predictable
            (2, "a a b b a b b a a b a b"),  # same unigrams, mixed transitions
        ],
    )
    got = {r["doc_id"]: r["surprisal_nats"] for r in bigram_lm_scores(docs).collect()}
    assert got[1] < got[2]


def _kn_py(docs, d=0.75):
    """Python replay of interpolated Kneser-Ney bigram surprisal."""
    trans = {}
    for _, text in docs:
        ts = text.lower().split()
        for p, c in zip(ts, ts[1:]):
            trans[(p, c)] = trans.get((p, c), 0) + 1
    ctx_tot, ctx_fan, cont_fan = {}, {}, {}
    for (p, c), n in trans.items():
        ctx_tot[p] = ctx_tot.get(p, 0) + n
        ctx_fan[p] = ctx_fan.get(p, 0) + 1
        cont_fan[c] = cont_fan.get(c, 0) + 1
    b_total = len(trans)
    out = {}
    for doc_id, text in docs:
        ts = text.lower().split()
        if len(ts) < 2:
            continue
        nats = 0.0
        for p, c in zip(ts, ts[1:]):
            prob = (trans[(p, c)] - d) / ctx_tot[p] + (
                d * ctx_fan[p] / ctx_tot[p]
            ) * (cont_fan[c] / b_total)
            nats += -math.log(prob)
        out[doc_id] = (round(nats / (len(ts) - 1), 4), len(ts) - 1)
    return out


def test_kneser_ney_matches_python_replay(spark):
    from usajobs_etl_service_spark.operators.retrieval import kneser_ney_scores

    rows = [
        (1, "a b a b a c"),
        (2, "b a b a"),
        (3, "c a d b"),
        (4, "one"),  # single token: no transitions, excluded
    ]
    got = {
        r["doc_id"]: (r["kn_surprisal_nats"], r["n_transitions"])
        for r in kneser_ney_scores(_docs(spark, rows)).collect()
    }
    assert got == _kn_py(rows)
    assert 4 not in got


def test_kneser_ney_repetition_scores_low(spark):
    # the repetitive doc's transitions are all high-count; the varied
    # doc pays for rare transitions — the gate's sort order.
    from usajobs_etl_service_spark.operators.retrieval import kneser_ney_scores

    rows = [
        (1, "spam spam spam spam spam spam spam spam"),
        (2, "the quick brown fox jumps over lazy dogs"),
    ]
    got = {r["doc_id"]: r["kn_surprisal_nats"] for r in kneser_ney_scores(_docs(spark, rows)).collect()}
    assert got[1] < got[2]


def test_rrf_fuse_hand_example_with_ties_and_missing_docs(spark):
    from usajobs_etl_service_spark.operators.retrieval import rrf_fuse

    # leg A: doc 1 rank 1; docs 2,3 TIE on score 0.5 -> both rank 2
    # (rank(), not row_number); doc 4 rank 4. leg B: doc 3 rank 1,
    # doc 1 rank 2; docs 2,4 absent (contribute nothing).
    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.5), (3, 0.5), (4, 0.1)], "doc_id long, score double"
    )
    b = spark.createDataFrame([(3, 0.8), (1, 0.2)], "doc_id long, score double")
    rows = rrf_fuse([("a", a), ("b", b)], rrf_k=60, top_n=10, top_k=10).collect()
    got = {r["doc_id"]: (r["rrf"], r["rank_a"], r["rank_b"]) for r in rows}
    assert got == {
        1: (round(1 / 61 + 1 / 62, 6), 1, 2),
        3: (round(1 / 62 + 1 / 61, 6), 2, 1),
        2: (round(1 / 62, 6), 2, None),
        4: (round(1 / 64, 6), 4, None),
    }
    # fused order: ties in rrf (docs 1 and 3 are symmetric) break by id
    assert [r["doc_id"] for r in rows] == [1, 3, 2, 4]


def test_rrf_fuse_top_n_cut_is_rank_stable(spark):
    from usajobs_etl_service_spark.operators.retrieval import rrf_fuse

    # 10-doc leg cut at top_n=3: surviving ranks equal full-leg ranks
    leg = spark.createDataFrame(
        [(i, 1.0 - i / 10.0) for i in range(1, 11)], "doc_id long, score double"
    )
    rows = rrf_fuse([("only", leg)], rrf_k=60, top_n=3, top_k=10).collect()
    assert {r["doc_id"]: r["rank_only"] for r in rows} == {1: 1, 2: 2, 3: 3}


def test_ranking_agreement_hand_metrics(spark):
    from usajobs_etl_service_spark.operators.retrieval import ranking_agreement

    # A ranks 1,2,3,4; B ranks 3,1,2 (doc 4 absent from B).
    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6)], "doc_id long, score double"
    )
    b = spark.createDataFrame([(3, 0.9), (1, 0.5), (2, 0.4)], "doc_id long, score double")
    row = ranking_agreement(a, b, top_n=4).first()
    assert row["overlap"] == 3
    assert row["jaccard"] == round(3 / (4 + 3 - 3), 6)
    # MRR of A's 4 docs under B's ranks: 1/2 + 1/3 + 1/1 + 0, over 4
    assert row["mrr_a_in_b"] == round((1 / 2 + 1 / 3 + 1 + 0) / 4, 6)
    # intersection {1,2,3}: A ranks (1,2,3), B ranks (2,3,1) ->
    # pairs (1,2): concordant; (1,3): discordant; (2,3): discordant
    assert (row["concordant"], row["discordant"], row["n_pairs"]) == (1, 2, 3)
    assert row["kendall_tau"] == round((1 - 2) / 3, 6)


def test_ranking_agreement_short_leg_uses_measured_denominator(spark):
    from usajobs_etl_service_spark.operators.retrieval import ranking_agreement

    # leg A yields only 2 rows under top_n=10: MRR must average over
    # the MEASURED shortlist (2), not the requested cut (10) — a sparse
    # leg is not ten absent candidates
    a = spark.createDataFrame([(1, 0.9), (2, 0.8)], "doc_id long, score double")
    b = spark.createDataFrame([(2, 0.9), (1, 0.5)], "doc_id long, score double")
    row = ranking_agreement(a, b, top_n=10).first()
    assert row["mrr_a_in_b"] == round((1 / 2 + 1 / 1) / 2, 6)


def test_ranking_agreement_disjoint_legs(spark):
    from usajobs_etl_service_spark.operators.retrieval import ranking_agreement

    a = spark.createDataFrame([(1, 1.0), (2, 0.5)], "doc_id long, score double")
    b = spark.createDataFrame([(3, 1.0), (4, 0.5)], "doc_id long, score double")
    row = ranking_agreement(a, b, top_n=2).first()
    assert row["overlap"] == 0 and row["jaccard"] == 0.0
    assert row["mrr_a_in_b"] == 0.0
    assert row["kendall_tau"] is None and row["n_pairs"] == 0


def test_llr_ranks_true_collocation_over_equal_count_independents(spark):
    from usajobs_etl_service_spark.operators.retrieval import llr_collocations

    # 'strong bond' is always adjacent (20x, never apart); the
    # background tokens are iid-shuffled, so their pairs occur at
    # ~independence expectation (MORE often than 20, but with no
    # association evidence) — G2 must rank the true collocation first.
    import random

    rng = random.Random(9)
    rows = [
        (i, "strong bond " + " ".join(rng.choice("x y z".split()) for _ in range(12)))
        for i in range(20)
    ]
    docs = _docs(spark, rows)
    out = llr_collocations(docs, min_count=5, top_k=10).collect()
    assert out[0]["a"] == "strong" and out[0]["b"] == "bond"
    background = [r["g2"] for r in out if (r["a"], r["b"]) != ("strong", "bond")]
    assert all(out[0]["g2"] > g for g in background)


def test_llr_matches_python_replay(spark):
    import math
    import random

    from usajobs_etl_service_spark.operators.retrieval import llr_collocations

    rng = random.Random(3)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(40)
    ]
    # python replay
    bi, ca, cb = {}, {}, {}
    n = 0
    for _, text in rows:
        ts = text.split()
        for p, c in zip(ts, ts[1:]):
            bi[(p, c)] = bi.get((p, c), 0) + 1
            ca[p] = ca.get(p, 0) + 1
            cb[c] = cb.get(c, 0) + 1
            n += 1
    nf = float(n)

    def g2(p, c):
        k11 = bi[(p, c)]
        terms = [
            (k11, ca[p], cb[c]),
            (ca[p] - k11, ca[p], nf - cb[c]),
            (cb[c] - k11, nf - ca[p], cb[c]),
            (nf - ca[p] - cb[c] + k11, nf - ca[p], nf - cb[c]),
        ]
        return 2.0 * sum(
            k * math.log(k * nf / (r * col)) if k > 0 else 0.0 for k, r, col in terms
        )

    expect = sorted(
        ((p, c, bi[(p, c)], round(g2(p, c), 6)) for (p, c), k in bi.items() if k >= 5),
        key=lambda t: (-t[3], t[0], t[1]),
    )[:10]
    got = [
        (r["a"], r["b"], r["pair_count"], r["g2"])
        for r in llr_collocations(_docs(spark, rows), min_count=5, top_k=10).collect()
    ]
    assert got == expect
