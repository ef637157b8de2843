"""Semantic tests for operators/graphrank.py (cross-engine equality is
the q105 oracle-parity row)."""

from __future__ import annotations

import pytest

from usajobs_etl_service_spark.operators.graphrank import pagerank, textrank_terms


def _pr_dict(df):
    return {r["node"]: r["pr"] for r in df.collect()}


def test_pagerank_matches_hand_power_method(spark):
    # Directed triangle plus a feeder: a->b, b->c, c->a, d->a (all out-
    # degree 1). Replay the power method in Python and compare exactly.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")], "src string, dst string"
    )
    got = _pr_dict(pagerank(edges, n_iter=3))
    pr = {n: 1 / 4 for n in "abcd"}
    out = {"a": ["b"], "b": ["c"], "c": ["a"], "d": ["a"]}
    for _ in range(3):
        nxt = {}
        for v in "abcd":
            inc = sum(pr[u] / len(out[u]) for u in "abcd" if v in out[u])
            nxt[v] = (1 - 0.85) / 4 + 0.85 * inc
        pr = nxt
    assert got == pytest.approx(pr)


def test_pagerank_symmetric_graph_is_uniform_and_conserves_mass(spark):
    # On a regular symmetric graph the uniform vector is the fixed
    # point; total mass stays 1 every iteration (no dangling nodes).
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    got = _pr_dict(pagerank(edges, n_iter=4))
    assert all(abs(v - 1 / 3) < 1e-12 for v in got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_textrank_hub_term_ranks_first(spark):
    # 'hub' neighbors every filler term; fillers only touch the hub.
    rows = [(i, f"hub w{i % 4} hub w{(i + 1) % 4} hub w{(i + 2) % 4}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textrank_terms(docs, min_cooccur=5, n_iter=3, top_k=5).collect()
    assert out[0]["term"] == "hub" and out[0]["rank"] == 1
    assert out[0]["pr"] > out[1]["pr"]


def test_triangle_stats_k4_plus_tail(spark):
    # K4 on {1,2,3,4} (4 triangles, every edge) + pendant 5-1: hand
    # census: 7 edges, wedges = C(4,2)*... degrees: 1->4, 2/3/4->3,
    # 5->1 => wedges = 6 + 3*3 + 0 = 15, triangles = 4,
    # transitivity = 12/15 = 0.8
    from usajobs_etl_service_spark.operators.graphrank import triangle_stats

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)], ["u", "v"]
    )
    row = triangle_stats(edges).first()
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["n_wedges"] == 15
    assert row["n_triangles"] == 4
    assert abs(row["transitivity"] - 0.8) < 1e-9


def test_triangle_stats_normalizes_unordered_and_dup_edges(spark):
    # same triangle given as unordered / duplicated pairs: filter+distinct
    # inside the operator must normalize (u<v kept, rest dropped)
    from usajobs_etl_service_spark.operators.graphrank import triangle_stats

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 3), (1, 2)], ["u", "v"]
    )
    row = triangle_stats(edges).first()
    assert row["n_edges"] == 3 and row["n_triangles"] == 1
    assert abs(row["transitivity"] - 1.0) < 1e-9


def test_triangle_stats_triangle_free_bipartite(spark):
    from usajobs_etl_service_spark.operators.graphrank import triangle_stats

    # C4: 1-2, 2-3(via 1-3? no) -- bipartite square 1-2, 2-4(nope)
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"])
    row = triangle_stats(edges).first()
    assert row["n_triangles"] == 0
    assert abs(row["transitivity"] - 0.0) < 1e-9


def test_triangle_stats_matches_bruteforce_random_graphs(spark):
    """Property check without per-example Spark jobs being too slow:
    a handful of seeded Erdos-Renyi graphs, censused by brute force
    (itertools) and by the degree-oriented operator."""
    import itertools
    import random

    from usajobs_etl_service_spark.operators.graphrank import triangle_stats

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = 14
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < 0.35
        ]
        if not edges:
            continue
        adj = {x: set() for x in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        nodes = [x for x in range(n) if adj[x]]
        tri = sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )
        wedges = sum(len(adj[x]) * (len(adj[x]) - 1) // 2 for x in nodes)
        row = triangle_stats(spark.createDataFrame(edges, ["u", "v"])).first()
        assert row["n_nodes"] == len(nodes), seed
        assert row["n_edges"] == len(edges), seed
        assert row["n_wedges"] == wedges, seed
        assert row["n_triangles"] == tri, seed


def test_assortativity_star_is_minus_one(spark):
    # star S3: hub degree 3, leaves degree 1 — the textbook r = -1 graph
    from usajobs_etl_service_spark.operators.graphrank import degree_assortativity

    edges = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], ["u", "v"])
    row = degree_assortativity(edges).first()
    assert row["n_edges"] == 3
    assert abs(row["assortativity"] - (-1.0)) < 1e-9


def test_assortativity_matches_hand_moments(spark):
    # path 1-2-3-4: degrees 1,2,2,1; directed pairs (dx,dy):
    # (1,2),(2,1),(2,2),(2,2),(2,1),(1,2) -> n=6, sx=sy=10,
    # sxy=16, sxx=syy=18 -> r = (96-100)/(108-100) = -0.5
    from usajobs_etl_service_spark.operators.graphrank import degree_assortativity

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
    row = degree_assortativity(edges).first()
    assert abs(row["assortativity"] - (-0.5)) < 1e-9


def test_common_neighbor_links_square_and_path(spark):
    from usajobs_etl_service_spark.operators.graphrank import common_neighbor_links

    # square 1-2-3-4-1: the two diagonals each share 2 neighbors
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"])
    rows = [(r["u"], r["v"], r["common_neighbors"]) for r in common_neighbor_links(edges).collect()]
    assert rows == [(1, 3, 2), (2, 4, 2)]
    # path 1-2-3: one candidate link
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["u", "v"])
    rows = [(r["u"], r["v"], r["common_neighbors"]) for r in common_neighbor_links(edges).collect()]
    assert rows == [(1, 3, 1)]


def _kcore_py(edges, k, rounds):
    """Python replay of the bounded-round peel: dict node -> degree."""
    E = {tuple(sorted(e)) for e in edges}
    for _ in range(rounds):
        deg = {}
        for a, b in E:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            break
        E = {(a, b) for a, b in E if a not in bad and b not in bad}
    deg = {}
    for a, b in E:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_kcore_triangle_with_pendant_chain(spark):
    # triangle {1,2,3} + chain 3-4-5: round 1 peels 5 (deg 1), round 2
    # peels the now-degree-1 node 4 — the 2-core is the triangle, and
    # finding it NEEDS the second round (a one-shot degree filter
    # keeps 4).
    from usajobs_etl_service_spark.operators.graphrank import kcore_membership

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], ["u", "v"]
    )
    for thr in (0, 500_000):  # distributed supersteps AND driver peel
        got = {
            r["node"]: r["core_degree"]
            for r in kcore_membership(edges, k=2, rounds=4, small_graph_edges=thr).collect()
        }
        assert got == {1: 2, 2: 2, 3: 2}, thr


def test_kcore_path_peels_to_empty(spark):
    from usajobs_etl_service_spark.operators.graphrank import kcore_membership

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
    assert kcore_membership(edges, k=2, rounds=6).count() == 0


def test_kcore_bounded_rounds_pre_convergence(spark):
    # 7-path with k=2 and only TWO rounds: each round trims one node
    # off each end — the contract is the bounded-round result (the
    # unrolled-oracle semantics), not the converged core (empty here).
    from usajobs_etl_service_spark.operators.graphrank import kcore_membership

    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 7)], ["u", "v"])
    got = {r["node"]: r["core_degree"] for r in kcore_membership(edges, k=2, rounds=2).collect()}
    assert got == _kcore_py([(i, i + 1) for i in range(1, 7)], 2, 2)
    assert got == {3: 1, 4: 2, 5: 1}


def test_kcore_matches_python_replay_on_random_graphs(spark):
    import random

    from usajobs_etl_service_spark.operators.graphrank import kcore_membership

    for seed in (7, 19, 23):
        rng = random.Random(seed)
        n = 40
        edges = sorted(
            {
                (a, b)
                for _ in range(90)
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        for k in (2, 3, 4):
            # small_graph_edges=0 forces the distributed parquet-
            # superstep path; the default exercises the driver peel —
            # both must equal the Python replay
            for thr in (0, 500_000):
                got = {
                    r["node"]: r["core_degree"]
                    for r in kcore_membership(
                        spark.createDataFrame(edges, ["u", "v"]),
                        k=k,
                        rounds=8,
                        small_graph_edges=thr,
                    ).collect()
                }
                assert got == _kcore_py(edges, k, 8), (seed, k, thr)


def test_hits_hand_bipartite_is_fibonacci(spark):
    # s1->{t1,t2}, s2->{t1}: with h0=1 the unnormalized iterates are
    # Fibonacci — a1=(2,1), h1=(3,2), a2=(5,3), h2=(8,5), a3=(13,8),
    # h3=(21,13) — integer-exact by construction.
    from usajobs_etl_service_spark.operators.graphrank import hits_scores

    edges = spark.createDataFrame([(1, 10), (1, 20), (2, 10)], ["s", "t"])
    rows = {(r["kind"], r["node"]): (r["score"], r["score_norm"], r["rank"])
            for r in hits_scores(edges, n_iter=3, top_k=20).collect()}
    assert rows == {
        ("hub", 1): (21, 1.0, 1),
        ("hub", 2): (13, round(13 / 21, 6), 2),
        ("authority", 10): (13, 1.0, 1),
        ("authority", 20): (8, round(8 / 13, 6), 2),
    }


def test_hits_top_k_cut_and_determinism(spark):
    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.operators.graphrank import hits_scores

    edges = spark.createDataFrame(
        [(s, t) for s in range(5) for t in range(100, 103)] + [(9, 100)],
        ["s", "t"],
    )
    out = hits_scores(edges, n_iter=2, top_k=3)
    hubs = [r["node"] for r in out.filter(F.col("kind") == "hub").orderBy("rank").collect()]
    # 0-4 are symmetric full hubs (tie -> id asc), 9 is the weak hub
    assert hubs == [0, 1, 2]
    assert out.filter(F.col("kind") == "authority").count() == 3


def test_triangle_sampled_p1_identical_and_validation(spark):
    """sample_p=1 must take the EXACT path (bit-identical row, same
    schema); out-of-range p rejected."""
    import pytest

    from usajobs_etl_service_spark.operators.graphrank import (
        degree_assortativity,
        triangle_stats,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)], ["u", "v"]
    )
    exact = triangle_stats(edges).first()
    p1 = triangle_stats(edges, sample_p=1.0).first()
    assert tuple(exact) == tuple(p1)
    assert triangle_stats(edges).schema == triangle_stats(edges, sample_p=1.0).schema
    a_exact = degree_assortativity(edges).first()
    a_p1 = degree_assortativity(edges, sample_p=1.0).first()
    assert tuple(a_exact) == tuple(a_p1)
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="sample_p"):
            triangle_stats(edges, sample_p=bad)
        with pytest.raises(ValueError, match="sample_p"):
            degree_assortativity(edges, sample_p=bad)


def test_triangle_sampled_matches_python_replay_and_error_bound(spark):
    """DOULION estimator on a seeded dense planted graph: (a) the
    md5-thinned sample and scaled counts are reproduced exactly by a
    Python replay of the same hash recipe (determinism — the property
    that makes q191 hash-checkable), and (b) the triangle estimate
    lands within 30% of the exact census on this graph (Tsourakakis
    2009 variance is tiny at p=0.5 with thousands of triangles)."""
    import hashlib
    import itertools
    import random

    from usajobs_etl_service_spark.operators.graphrank import triangle_stats

    rng = random.Random(5)
    n = 60
    edges = [
        (a, b) for a, b in itertools.combinations(range(n), 2) if rng.random() < 0.4
    ]
    df = spark.createDataFrame(edges, ["u", "v"])
    p = 0.5
    row = triangle_stats(df, sample_p=p).first()
    exact = triangle_stats(df).first()

    def kept(a, b):
        h = hashlib.md5(f"{a}|{b}#42".encode()).hexdigest()[:8]
        return int(h, 16) / 4294967296.0 < p

    sampled = [(a, b) for a, b in edges if kept(a, b)]
    adj = {x: set() for x in range(n)}
    for a, b in sampled:
        adj[a].add(b)
        adj[b].add(a)
    nodes = [x for x in range(n) if adj[x]]
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(adj[x]) * (len(adj[x]) - 1) // 2 for x in nodes)
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == round(len(sampled) / p)
    assert row["n_wedges"] == round(wedges / (p * p))
    assert row["n_triangles"] == round(tri / (p * p * p))
    # error bound on the planted graph
    assert abs(row["n_triangles"] - exact["n_triangles"]) <= 0.3 * exact["n_triangles"], (
        row["n_triangles"],
        exact["n_triangles"],
    )
    assert abs(row["transitivity"] - exact["transitivity"]) <= 0.3 * exact["transitivity"]


def test_assortativity_sampled_close_to_exact(spark):
    """Pearson correlation is scale-invariant under uniform degree
    thinning: the p=0.5 sampled coefficient must sit near the exact
    one on a seeded graph with real degree structure."""
    import itertools
    import random

    from usajobs_etl_service_spark.operators.graphrank import degree_assortativity

    rng = random.Random(9)
    # hub-heavy graph: low ids attach preferentially (negative assortativity)
    edges = list(
        {
            (min(a, b), max(a, b))
            for _ in range(900)
            for a, b in [(rng.randint(0, 9), rng.randint(0, 79))]
            if a != b
        }
    )
    df = spark.createDataFrame(edges, ["u", "v"])
    exact = degree_assortativity(df).first()["assortativity"]
    got = degree_assortativity(df, sample_p=0.5).first()["assortativity"]
    assert abs(got - exact) <= 0.2, (got, exact)


def test_census_auto_gate_flips_above_edge_budget(spark):
    """Round-11 auto gate: default calls stay EXACT at or under the
    edge budget; a beyond-budget graph flips to the DOULION path with
    p sized to thin back to ~budget edges (identical to the same
    explicit sample_p call); edge_budget=0 disables the gate."""
    import itertools
    import random

    from usajobs_etl_service_spark.operators.graphrank import (
        degree_assortativity,
        triangle_stats,
    )

    rng = random.Random(7)
    n = 40
    edges = [
        (a, b) for a, b in itertools.combinations(range(n), 2) if rng.random() < 0.5
    ]
    df = spark.createDataFrame(edges, ["u", "v"])
    m = len(edges)  # all distinct, already u < v
    budget = m // 2  # beyond-budget: gate must flip to p = budget/m

    auto = triangle_stats(df, edge_budget=budget).first()
    forced = triangle_stats(df, sample_p=round(budget / m, 4)).first()
    exact = triangle_stats(df).first()
    assert tuple(auto) == tuple(forced)
    assert tuple(auto) != tuple(exact)  # the thinned estimate, not the census

    a_auto = degree_assortativity(df, edge_budget=budget).first()
    a_forced = degree_assortativity(df, sample_p=round(budget / m, 4)).first()
    assert tuple(a_auto) == tuple(a_forced)

    # at-or-under budget -> exact; gate disabled -> exact at any size
    assert tuple(triangle_stats(df, edge_budget=m).first()) == tuple(exact)
    assert tuple(triangle_stats(df, edge_budget=0).first()) == tuple(exact)

    # explicit sample_p always wins over the gate
    assert tuple(
        triangle_stats(df, sample_p=1.0, edge_budget=1).first()
    ) == tuple(exact)


def test_census_auto_gate_variance_floor(spark):
    """p = budget/m is floored at 0.05: a budget vastly under m must
    not thin to noise."""
    from usajobs_etl_service_spark.operators.graphrank import (
        _resolve_sample_p,
    )
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id").alias("u"), (F.col("id") + 1000).alias("v")
    )
    assert _resolve_sample_p(df, None, 1) == 0.05
