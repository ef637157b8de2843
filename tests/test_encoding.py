"""Target encoding + WOE/IV (operators/encoding.py): Python replay,
the no-leakage property, degenerate cells, row-level apply."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.encoding import (
    fold_of,
    target_encode_apply,
    target_encoding_table,
    woe_iv,
)

K = 3
M = 2.0


def _fold(key, k=K, seed=42) -> int:
    h = int(hashlib.md5((str(key) + f"#{seed}").encode()).hexdigest()[:8], 16)
    return int(h / 2**32 * k)


def _py_table(rows, k=K, m=M):
    """rows: list of (key, category, label)."""
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0.0])
    for key, c, y in rows:
        cell = cells[(c, _fold(key, k))]
        cell[0] += 1
        cell[1] += y
    prior = sum(s for _, s in cells.values()) / sum(n for n, _ in cells.values())
    out = {}
    for (c, f), (n, s) in cells.items():
        cn = sum(nn for (cc, ff), (nn, _) in cells.items() if cc == c) - n
        cs = sum(ss for (cc, ff), (_, ss) in cells.items() if cc == c) - s
        out[(c, f)] = (cn, (cs + m * prior) / (cn + m))
    return out, prior


@pytest.fixture()
def rows():
    return [(i, "ab"[i % 2], float(i * 7 % 13)) for i in range(40)]


@pytest.fixture()
def df(spark, rows):
    return spark.createDataFrame(rows, ["key", "cat", "y"])


def test_table_matches_python_replay(spark, df, rows):
    got = {
        (r["category"], r["fold"]): (r["n_oof"], r["te"])
        for r in target_encoding_table(
            df, category_col="cat", label_col="y", key_col="key", k=K, smoothing=M
        ).collect()
    }
    want, _ = _py_table(rows)
    assert set(got) == set(want)
    for cell, (n, te) in want.items():
        assert got[cell][0] == n
        assert got[cell][1] == pytest.approx(te, abs=1e-9)


def test_no_leakage_own_fold_labels_do_not_move_the_cell(spark, rows):
    """Perturb every label inside ('a', fold 0): te('a', 0) must not
    move; te('a', other folds) must."""
    base = spark.createDataFrame(rows, ["key", "cat", "y"])
    poisoned = spark.createDataFrame(
        [
            (k, c, y + 1000.0 if (c == "a" and _fold(k) == 0) else y)
            for k, c, y in rows
        ],
        ["key", "cat", "y"],
    )

    def cell(d, f):
        return (
            target_encoding_table(
                d, category_col="cat", label_col="y", key_col="key", k=K,
                smoothing=0.0,
            )
            .filter((F.col("category") == "a") & (F.col("fold") == f))
            .first()["te"]
        )

    assert cell(base, 0) == pytest.approx(cell(poisoned, 0), abs=1e-9)
    assert cell(base, 1) != pytest.approx(cell(poisoned, 1), abs=1e-6)


def test_single_fold_category_encodes_as_prior(spark):
    """A category whose rows all hash into one fold has zero
    out-of-fold support: te == prior exactly."""
    keys_in_f0 = [k for k in range(200) if _fold(k) == 0][:5]
    rows = [(k, "lonely", 99.0) for k in keys_in_f0] + [
        (1000 + i, "common", float(i)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["key", "cat", "y"])
    t = target_encoding_table(
        df, category_col="cat", label_col="y", key_col="key", k=K, smoothing=M
    )
    lonely = t.filter(F.col("category") == "lonely").collect()
    assert len(lonely) == 1 and lonely[0]["n_oof"] == 0
    _, prior = _py_table(rows)
    assert lonely[0]["te"] == pytest.approx(prior, abs=1e-9)


def test_apply_joins_oof_value_and_nulls_unseen(spark, df, rows):
    t = target_encoding_table(
        df, category_col="cat", label_col="y", key_col="key", k=K, smoothing=M
    )
    plus = df.union(spark.createDataFrame([(999, "zzz", 1.0)], df.schema))
    out = {
        r["key"]: r["te"]
        for r in target_encode_apply(
            plus, t, category_col="cat", key_col="key", k=K
        ).collect()
    }
    want, _ = _py_table(rows)
    for k, c, _ in rows:
        assert out[k] == pytest.approx(want[(c, _fold(k))][1], abs=1e-9)
    assert out[999] is None


def test_validation(spark, df):
    with pytest.raises(ValueError, match=">= 2"):
        target_encoding_table(df, category_col="cat", label_col="y", key_col="key", k=1)
    with pytest.raises(ValueError, match=">= 0"):
        target_encoding_table(
            df, category_col="cat", label_col="y", key_col="key", smoothing=-1.0
        )


def test_woe_iv_python_replay_and_zero_cell(spark):
    rows = [("a", True)] * 6 + [("a", False)] * 2 + [("b", True)] * 1 + [
        ("b", False)
    ] * 5 + [("c", True)] * 3  # c has ZERO bads -> Laplace keeps it finite
    df = spark.createDataFrame(rows, ["cat", "good"])
    got = {r["category"]: r for r in woe_iv(df, category_col="cat", label_col="good").collect()}
    gt, bt = 10.0, 7.0
    for c, (g, b) in {"a": (6, 2), "b": (1, 5), "c": (3, 0)}.items():
        woe = math.log(((g + 0.5) / gt) / ((b + 0.5) / bt))
        assert got[c]["woe"] == pytest.approx(woe, abs=1e-9)
        assert got[c]["iv_term"] == pytest.approx((g / gt - b / bt) * woe, abs=1e-9)
        assert math.isfinite(got[c]["woe"])
    assert got["c"]["n_bad"] == 0


def test_fold_is_deterministic_and_in_range(spark):
    df = spark.range(500).select(fold_of(F.col("id"), 7).alias("f"))
    vals = [r["f"] for r in df.collect()]
    assert set(vals) <= set(range(7))
    assert [r["f"] for r in df.collect()] == vals  # re-run identical
