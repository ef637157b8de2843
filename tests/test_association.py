"""association_rules vs a brute-force Python reference."""

from __future__ import annotations

from itertools import combinations

import pytest

from usajobs_etl_service_spark.operators.association import association_rules


def _rules_py(baskets, min_pair_count, top_n):
    sets = {b: set(items) for b, items in baskets.items()}
    n = len(sets)
    supp: dict[str, int] = {}
    pair: dict[tuple[str, str], int] = {}
    for s in sets.values():
        for i in s:
            supp[i] = supp.get(i, 0) + 1
        for x, y in combinations(sorted(s), 2):
            pair[(x, y)] = pair.get((x, y), 0) + 1
    rules = []
    for (x, y), c in pair.items():
        if c < min_pair_count:
            continue
        for a, b in ((x, y), (y, x)):
            conf = c / supp[a]
            lift = c * n / (supp[a] * supp[b])
            rules.append((a, b, c, supp[a], supp[b], conf, lift))
    rules.sort(key=lambda r: (-r[6], -r[5], r[0], r[1]))
    return [
        (a, b, c, sa, sb, round(conf, 6), round(lift, 6))
        for a, b, c, sa, sb, conf, lift in rules[:top_n]
    ]


BASKETS = {
    1: ["beer", "chips", "salsa"],
    2: ["beer", "chips"],
    3: ["beer", "diapers"],
    4: ["diapers", "chips"],
    5: ["beer", "diapers", "chips"],
    6: ["milk"],
    7: ["milk", "beer", "beer"],  # duplicate item: set semantics
}


def _df(spark):
    rows = [(b, i) for b, items in BASKETS.items() for i in items]
    return spark.createDataFrame(rows, "basket long, item string")


def test_matches_bruteforce(spark):
    got = [
        (r.antecedent, r.consequent, r.pair_n, r.supp_a, r.supp_c, r.confidence, r.lift)
        for r in association_rules(
            _df(spark), "basket", "item", min_pair_count=2, top_n=10
        ).collect()
    ]
    assert got == _rules_py(BASKETS, 2, 10)


def test_lift_symmetric_confidence_directional(spark):
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            _df(spark), "basket", "item", min_pair_count=1, top_n=100
        ).collect()
    }
    ab = out[("beer", "chips")]
    ba = out[("chips", "beer")]
    assert ab.lift == ba.lift
    assert ab.pair_n == ba.pair_n == 3
    assert ab.confidence == round(3 / 5, 6)  # beer in 5 baskets
    assert ba.confidence == round(3 / 4, 6)  # chips in 4 baskets


def test_min_pair_count_filters(spark):
    out = association_rules(
        _df(spark), "basket", "item", min_pair_count=3, top_n=100
    ).collect()
    assert {(r.antecedent, r.consequent) for r in out} == {
        ("beer", "chips"),
        ("chips", "beer"),
    }


def test_nulls_excluded_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (None, "c"), (2, None), (2, "a"), (2, "b")],
        "basket long, item string",
    )
    out = association_rules(df, "basket", "item", min_pair_count=2, top_n=5).collect()
    assert [(r.antecedent, r.consequent, r.pair_n) for r in out] == [
        ("a", "b", 2),
        ("b", "a", 2),
    ]
    with pytest.raises(ValueError):
        association_rules(df, "basket", "item", min_pair_count=0)
