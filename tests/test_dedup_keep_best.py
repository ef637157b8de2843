"""dedup_keep_best: quality-argmax canonical selection."""

from __future__ import annotations

from usajobs_etl_service_spark.operators.dedup import dedup_keep_best


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, fp string, q long, payload string")


def test_keeps_highest_quality_then_min_id(spark):
    rows = [
        (1, "a", 10, "short"),
        (2, "a", 30, "long"),     # winner: best quality
        (3, "a", 30, "long2"),    # same quality, higher id -> loses
        (4, "b", 5, "only"),      # singleton survives
        (9, "c", 7, "tie1"),      # tie cluster: min id wins
        (8, "c", 7, "tie2"),
    ]
    out = {r.fp: r for r in dedup_keep_best(_df(spark, rows), ["fp"], "q", "id").collect()}
    assert (out["a"].id, out["a"].n_copies, out["a"].payload) == (2, 3, "long")
    assert (out["b"].id, out["b"].n_copies) == (4, 1)
    assert (out["c"].id, out["c"].n_copies) == (8, 2)
    assert len(out) == 3  # exactly one survivor per cluster


def test_null_quality_sorts_below_any_value(spark):
    rows = [(1, "a", None, "x"), (2, "a", 1, "y"), (3, "b", None, "z"), (4, "b", None, "w")]
    out = {r.fp: r for r in dedup_keep_best(_df(spark, rows), ["fp"], "q", "id").collect()}
    assert out["a"].id == 2           # non-NULL beats NULL
    assert out["b"].id == 3           # all-NULL cluster: min id


def test_multi_column_key(spark):
    rows = [(1, "a", 5, "x"), (2, "a", 9, "x"), (3, "a", 9, "y")]
    df = _df(spark, rows)
    out = dedup_keep_best(df, ["fp", "payload"], "q", "id").collect()
    # clusters: (a,x) -> id 2 (q 9); (a,y) -> id 3
    assert sorted((r.id, r.n_copies) for r in out) == [(2, 2), (3, 1)]


def test_colliding_input_columns_rejected(spark):
    # an input already carrying the n_copies output (or any __dkb_
    # working name) must error loudly, not silently produce
    # ambiguous/duplicate columns after the joins
    import pytest

    df = spark.createDataFrame(
        [(1, "a", 5, 2)], "id long, fp string, q long, n_copies long"
    )
    with pytest.raises(ValueError, match="n_copies"):
        dedup_keep_best(df, ["fp"], "q", "id")


def test_keep_best_rejects_bk_alias_collision(spark):
    """Round-11 ADVICE: the generated per-key working aliases
    __dkb_bk_{i} are part of the collision set — an input already
    carrying one must error loudly, not produce ambiguous attributes
    after the join-back."""
    import pytest

    df = spark.createDataFrame(
        [("a", 1.0, 1, "x")], "fp string, q double, id int, __dkb_bk_0 string"
    )
    with pytest.raises(ValueError, match="__dkb_bk_0"):
        dedup_keep_best(df, ["fp"], "q", "id")
