"""quantile_normalize vs a pure-Python reference of the same
midpoint-quantile definition."""

from __future__ import annotations


from usajobs_etl_service_spark.operators.quantnorm import quantile_normalize


def _qn_py(rows):
    """rows: (id, group, value) -> {id: normalized}."""
    pooled = sorted((v, i) for i, _, v in rows)
    n = len(rows)
    by_group: dict[str, list] = {}
    for i, g, v in rows:
        by_group.setdefault(g, []).append((v, i))
    out = {}
    for g, vals in by_group.items():
        vals.sort()
        ng = len(vals)
        for r, (v, i) in enumerate(vals, start=1):
            idx = ((2 * r - 1) * n + 2 * ng - 1) // (2 * ng)
            out[i] = pooled[idx - 1][0]
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    got = quantile_normalize(df, "v", "grp", "id").collect()
    return {r.id: r.normalized for r in got}, {r.id: r.v for r in got}


def test_matches_python_reference(spark):
    rows = [(i, "abc"[(i * 7) % 3], ((i * 13) % 23) * 10) for i in range(60)]
    got, _ = _run(spark, rows)
    assert got == _qn_py(rows)


def test_equal_size_groups_get_identical_distributions(spark):
    # classic QN property: after normalization every equal-sized
    # group's sorted values are the same multiset
    rows = [(i, "ab"[i % 2], (i * 17) % 101) for i in range(40)]
    got, _ = _run(spark, rows)
    a = sorted(v for i, v in got.items() if i % 2 == 0)
    b = sorted(v for i, v in got.items() if i % 2 == 1)
    assert a == b


def test_single_group_is_identity(spark):
    rows = [(i, "x", (i * 11) % 31) for i in range(20)]
    got, raw = _run(spark, rows)
    assert got == raw  # rank r of n maps to pooled idx r


def test_skewed_group_sizes_and_ties(spark):
    # one dominant group + ties inside values
    rows = [(i, "big", (i % 5) * 3) for i in range(30)] + [
        (100 + i, "small", i * 100) for i in range(3)
    ]
    got, _ = _run(spark, rows)
    assert got == _qn_py(rows)


def test_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(0, "a", 1), (1, "a", None), (2, None, 5), (3, "b", 2)],
        "id long, grp string, v long",
    )
    got = quantile_normalize(df, "v", "grp", "id").collect()
    assert sorted(r.id for r in got) == [0, 3]
