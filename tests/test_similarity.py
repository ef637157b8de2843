"""Similarity search: brute-force exactness, IVF recall, knn join;
approx_count_distinct accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.similarity import (
    brute_force_knn_join,
    ivf_build,
    ivf_topk_cosine,
    topk_cosine,
)
from usajobs_etl_service_spark.session import read_table


def _query_vec(emb):
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]


def test_topk_cosine_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = read_table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    q = np.array(rows[0]["embedding"], dtype=np.float64)
    sims = {}
    for r in rows:
        if r["vec_id"] == 0:
            continue
        v = np.array(r["embedding"], dtype=np.float64)
        sims[r["vec_id"]] = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
    expected = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]

    got = topk_cosine(emb.filter(F.col("vec_id") != 0), _query_vec(emb), k=10, round_digits=6).collect()
    assert [r["vec_id"] for r in got] == [k for k, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert abs(r["sim"] - round(s, 6)) <= 1e-6


def test_ivf_recall_at_full_probe(spark, sf_dir):
    """Probing ALL centroids must recover the exact top-k (recall=1)."""
    emb = read_table(spark, sf_dir, "embeddings")
    qvec = _query_vec(emb)
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in topk_cosine(rest, qvec, k=10).collect()}
    index, cents = ivf_build(rest, n_centroids=8)
    approx_full = {r["vec_id"] for r in ivf_topk_cosine(index, cents, qvec, k=10, nprobe=8).collect()}
    assert approx_full == exact
    # partial probe keeps decent recall on this data
    approx_partial = {r["vec_id"] for r in ivf_topk_cosine(index, cents, qvec, k=10, nprobe=4).collect()}
    assert len(approx_partial & exact) >= 5


def test_knn_join_shape(spark):
    rows = [(i, [float(i), 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = brute_force_knn_join(df, df, k=2)
    per_query = {}
    for r in out.collect():
        per_query.setdefault(r["query_id"], []).append(r)
    assert set(per_query) == set(range(6))
    assert all(len(v) == 2 for v in per_query.values())


def test_approx_count_distinct_accuracy(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey", 0.05).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.1


def test_mmr_diversifies_past_a_near_duplicate(spark):
    from usajobs_etl_service_spark.operators.similarity import mmr_rerank

    # exact unit vectors, query [1,0]: rels are C=.96, A=.8, B=.6 and
    # sims are (C,A)=.6, (C,B)=.352, (A,B)=.96. Pure relevance picks
    # C then A; MMR at lam=0.5 scores step 2 as A: .5*.8-.5*.6=.1,
    # B: .5*.6-.5*.352=.124 — diversity flips the second pick to B.
    rows = [
        (1, [0.8, 0.6]),    # A
        (2, [0.6, 0.8]),    # B
        (3, [0.96, -0.28]), # C
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(df, [1.0, 0.0], k_candidates=3, k_select=2, lam=0.5)
    assert [r["vec_id"] for r in out.orderBy("selection_rank").collect()] == [3, 2]


def test_mmr_matches_python_replay(spark):
    import itertools
    import math
    import random

    from usajobs_etl_service_spark.operators.similarity import mmr_rerank

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(12)]
    q = [rng.uniform(-1, 1) for _ in range(4)]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    lam = 0.7
    rel = {i: round(cos(v, q), 4) for i, v in rows}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:8]
    sim = {
        (a, b): round(cos(dict(rows)[a], dict(rows)[b]), 4)
        for a, b in itertools.permutations(cand, 2)
    }
    chosen, remaining = [], sorted(cand)
    expect = []
    for rank in range(1, 6):
        best = min(
            remaining,
            key=lambda i: (
                -(lam * rel[i] - (1 - lam) * max((sim[(i, s)] for s in chosen), default=0.0)),
                i,
            ),
        )
        expect.append((best, rank))
        chosen.append(best)
        remaining.remove(best)

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(df, q, k_candidates=8, k_select=5, lam=lam)
    got = [(r["vec_id"], r["selection_rank"]) for r in out.orderBy("selection_rank").collect()]
    assert got == expect


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    from usajobs_etl_service_spark.operators.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], 0),   # anchor, label 0
        (2, [1.0, 0.01], 0),  # same label: excluded however similar
        (3, [0.9, 0.1], 1),   # nearest different-label
        (4, [0.5, 0.5], 1),
        (5, [-1.0, 0.0], 2),  # far
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = [
        (r["match_id"], r["rank"])
        for r in hard_negatives(df, [1], k=2).orderBy("rank").collect()
    ]
    assert got == [(3, 1), (4, 2)]


def test_hard_negatives_matches_unsalted_window(spark):
    import random

    from usajobs_etl_service_spark.operators.similarity import hard_negatives

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], rng.randrange(4))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = hard_negatives(df, [0, 1, 2], k=4)
    # unsalted reference: plain window over the same scored frame
    import math

    by_id = {i: (v, l) for i, v, l in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    expect = []
    for aid in (0, 1, 2):
        av, al = by_id[aid]
        scored = sorted(
            (
                (round(cos(av, v), 6), i)
                for i, (v, l) in by_id.items()
                if l != al
            ),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        expect += [(aid, mid, rank + 1) for rank, (_, mid) in enumerate(scored)]
    assert sorted(
        (r["anchor_id"], r["match_id"], r["rank"]) for r in got.collect()
    ) == sorted(expect)
