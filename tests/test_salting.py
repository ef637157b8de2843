"""Salted two-phase operators must equal their unsalted forms — on real
tables and on an adversarially skewed frame (one key with ~all rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.salting import salted_agg, salted_distinct, salted_topk_per_key
from usajobs_etl_service_spark.session import read_table


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of one hot key + 100 distinct cold keys
    hot = spark.range(10_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select(F.concat(F.lit("c"), F.col("id")).alias("k"), (F.col("id") * 1000).alias("v"))
    return hot.unionByName(cold)


def test_salted_distinct_matches_plain(spark, skewed):
    plain = {r["k"] for r in skewed.select("k").distinct().collect()}
    salted = {r["k"] for r in salted_distinct(skewed, ["k"]).collect()}
    assert salted == plain and len(plain) == 101


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in salted_agg(
            skewed, ["k"], {"n": "count(*)", "total": "sum(v)", "lo": "min(v)", "hi": "max(v)"}
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError, match="not decomposable"):
        salted_agg(skewed, ["k"], {"a": "avg(v)"})


def test_salted_topk_matches_plain_window(spark, skewed):
    order = [F.col("v").desc(), F.col("k").asc()]
    w = Window.partitionBy("k").orderBy(*order)
    plain = {
        (r["k"], r["rank"]): r["v"]
        for r in skewed.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3).collect()
    }
    salted = {(r["k"], r["rank"]): r["v"] for r in salted_topk_per_key(skewed, ["k"], order, 3).collect()}
    assert salted == plain


def test_salt_skips_map_columns(spark):
    # xxhash64 raises on map<> columns; the default salt must skip them
    # instead of failing the whole operator
    df = spark.createDataFrame(
        [("hot", i, {"a": i}) for i in range(50)], "k string, v long, props map<string,long>"
    )
    out = {
        r["k"]: r["n"]
        for r in salted_agg(df, ["k"], {"n": "count(*)"}).collect()
    }
    assert out == {"hot": 50}


def test_salt_cols_explicit_matches_plain(spark, skewed):
    # wide-row escape hatch: salt from (key + compact discriminator) only
    order = [F.col("v").desc(), F.col("k").asc()]
    w = Window.partitionBy("k").orderBy(*order)
    plain = {
        (r["k"], r["rank"]): r["v"]
        for r in skewed.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3).collect()
    }
    salted = {
        (r["k"], r["rank"]): r["v"]
        for r in salted_topk_per_key(skewed, ["k"], order, 3, salt_cols=["k", "v"]).collect()
    }
    assert salted == plain


def test_salted_topk_real_data(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    order = [F.col("ts").desc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    plain = {
        (r["user_id"], r["rank"]): r["event_id"]
        for r in events.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 2).collect()
    }
    salted = {
        (r["user_id"], r["rank"]): r["event_id"]
        for r in salted_topk_per_key(events, ["user_id"], order, 2).collect()
    }
    assert salted == plain


def test_join_skew_report_hand_values(spark):
    from usajobs_etl_service_spark.operators.salting import join_skew_report

    left = spark.createDataFrame(
        [("hot",)] * 6 + [("a",)] * 2 + [(None,)] * 3, "k string"
    )
    right = spark.createDataFrame(
        [("hot",)] * 5 + [("a",)] * 1 + [("only_right",)], "k2 string"
    )
    rows = join_skew_report(left, right, left_key="k", right_key="k2").collect()
    assert [r["key"] for r in rows] == ["hot", "a"]  # pairs desc; NULLs excluded
    hot = rows[0]
    assert (hot["n_left"], hot["n_right"], hot["pairs"]) == (6, 5, 30)
    assert hot["pct_of_output"] == round(30 / 32, 4)
    assert rows[1]["pairs"] == 2


def test_join_skew_report_plan_is_key_sized(spark, sf_dir):
    """The report must join KEY-CARDINALITY tables, never the data:
    no SortMergeJoin of the raw inputs, and the top-k is a
    TakeOrdered, not a global sort exchange."""
    from usajobs_etl_service_spark.operators.salting import join_skew_report
    from usajobs_etl_service_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    p = (
        join_skew_report(li, orders, left_key="l_orderkey", right_key="o_orderkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in p
    # both join inputs are aggregates (count tables), not raw scans:
    # two per-side partial counts feed the join
    import re
    assert len(re.findall(r"partial_count\(1\)", p)) >= 2, p[:600]


def test_join_skew_report_matches_raw_not_string_render(spark):
    """Round-8 review finding: matching through cast-to-string silently
    un-pairs int 1 vs decimal 1.0. Raw-value matching must pair them;
    genuinely incompatible dtypes must raise, not under-count."""
    from usajobs_etl_service_spark.operators.salting import join_skew_report

    from decimal import Decimal

    left = spark.createDataFrame([(1,)] * 4 + [(2,)], "k int")
    right = spark.createDataFrame(
        [(Decimal("1.0"),), (Decimal("1.0"),), (Decimal("2.0"),)], "k2 decimal(10,1)"
    )
    rows = {r["key"]: r["pairs"] for r in join_skew_report(left, right, left_key="k", right_key="k2").collect()}
    # int 1 pairs with decimal 1.0 (string forms '1' vs '1.0' differ)
    assert {k: int(v) for k, v in rows.items()} == {"1": 8, "2": 1}
    bad = spark.createDataFrame([("1",)], "k2 string")
    with pytest.raises(ValueError, match="not compatible"):
        join_skew_report(left, bad, left_key="k", right_key="k2")


def test_join_skew_report_pairs_is_decimal38(spark):
    """Type pin: pairs must be DECIMAL(38,0) — a bigint product wraps
    negative at ~3e9 x 3e9 rows on one key and would sort the hottest
    key OUT of the report (round-8 review finding)."""
    from usajobs_etl_service_spark.operators.salting import join_skew_report

    l = spark.createDataFrame([("k",)], "a string")
    r = spark.createDataFrame([("k",)], "b string")
    out = join_skew_report(l, r, left_key="a", right_key="b")
    assert dict(out.dtypes)["pairs"] == "decimal(38,0)"


# ---------------------------------------------------------------- skew_safe_join


@pytest.fixture(scope="module")
def skew_join_frames(spark):
    # 80%-share hot key 0: ids not divisible by 5 fold to 0
    left = spark.range(10_000).select(
        F.when(F.col("id") % 5 == 0, F.col("id")).otherwise(F.lit(0)).alias("k"),
        F.col("id").alias("v"),
    )
    # dim with a DUPLICATE row for the hot key (join multiplicity > 1)
    right = (
        spark.range(0, 10_000, 5)
        .select(F.col("id").alias("rk"), (F.col("id") * 2).alias("w"))
        .unionByName(spark.range(1).select(F.lit(0).alias("rk"), F.lit(-1).alias("w")))
    )
    return left, right


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_skew_safe_join_matches_plain(spark, skew_join_frames):
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left, right = skew_join_frames
    plain = _rows(left.join(right, F.col("k") == F.col("rk"), "inner").select("k", "v", "rk", "w"))
    assert len(plain) > 10_000  # hot key matched twice
    for strategy in ("broadcast", "salt"):
        got = _rows(
            skew_safe_join(
                left, right, left_key="k", right_key="rk", hot_keys=[0], strategy=strategy
            )
        )
        assert got == plain, strategy


def test_skew_safe_join_auto_finds_planted_key(spark, skew_join_frames):
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left, right = skew_join_frames
    plain = _rows(left.join(right, F.col("k") == F.col("rk"), "inner").select("k", "v", "rk", "w"))
    got = _rows(
        skew_safe_join(left, right, left_key="k", right_key="rk", auto_min_share=0.5)
    )
    assert got == plain
    # nothing clears a 99% share -> plain-join fallback, still equal
    got2 = _rows(
        skew_safe_join(left, right, left_key="k", right_key="rk", auto_min_share=0.99)
    )
    assert got2 == plain


def test_skew_safe_join_null_keys_drop_like_inner(spark):
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left = spark.createDataFrame([("hot", 1)] * 5 + [(None, 9), ("c", 2)], "k string, v int")
    right = spark.createDataFrame([("hot", 10), (None, 99), ("c", 20)], "rk string, w int")
    plain = _rows(left.join(right, F.col("k") == F.col("rk"), "inner").select("k", "v", "rk", "w"))
    got = _rows(skew_safe_join(left, right, left_key="k", right_key="rk", hot_keys=["hot"]))
    assert got == plain and all(r[0] is not None for r in got)


def test_skew_safe_join_validations(spark, skew_join_frames):
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left, right = skew_join_frames
    with pytest.raises(ValueError, match="inner"):
        skew_safe_join(left, right, left_key="k", right_key="rk", how="left")
    with pytest.raises(ValueError, match="strategy"):
        skew_safe_join(left, right, left_key="k", right_key="rk", strategy="magic")
    with pytest.raises(ValueError, match="auto_top_k"):
        skew_safe_join(left, right, left_key="k", right_key="rk", auto_top_k=10**9)
    with pytest.raises(ValueError, match="disjoint"):
        skew_safe_join(left, left, left_key="k")
    bad = right.select(F.col("rk").cast("string").alias("rk"), "w")
    with pytest.raises(ValueError, match="incoercible"):
        skew_safe_join(left, bad, left_key="k", right_key="rk")
    # round-9 review finding: a LOSSY numeric mix (bigint vs double —
    # 2^53 collides with 2^53+1 under coercion) can strand a match
    # across the hot/cold split; must be rejected, not silently wrong
    lossy = right.select(F.col("rk").cast("double").alias("rk"), "w")
    with pytest.raises(ValueError, match="incoercible"):
        skew_safe_join(left, lossy, left_key="k", right_key="rk")
    # lossless mixes stay allowed: int vs bigint
    ok = right.select(F.col("rk").cast("int").alias("rk"), "w")
    assert skew_safe_join(left, ok, left_key="k", right_key="rk", hot_keys=[0]).count() > 0
    with pytest.raises(ValueError, match="auto_min_share"):
        skew_safe_join(left, right, left_key="k", right_key="rk", auto_min_share=0.0)
    # a None hot key would NULL out the cold branch's ~isin filter and
    # silently drop the whole table — must be rejected up front
    with pytest.raises(ValueError, match="None"):
        skew_safe_join(left, right, left_key="k", right_key="rk", hot_keys=[0, None])


def test_skew_safe_join_plan_hot_branch_broadcasts(spark, skew_join_frames):
    """Plan pin: with auto-broadcast off (so the cold branch shows its
    true shuffled shape), the hot branch must STILL be a
    BroadcastHashJoin (the explicit hint) — the skewed rows never
    shuffle — while the cold branch sort-merge-joins."""
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left, right = skew_join_frames
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = skew_safe_join(left, right, left_key="k", right_key="rk", hot_keys=[0])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_skew_safe_join_property_random_frames(spark):
    """Property: for ANY key distribution, NULL mix, duplicate
    multiplicity, and hot-key set (even keys absent from the data),
    both strategies equal the plain inner join."""
    from hypothesis import given, settings, strategies as st

    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    keys = st.one_of(st.none(), st.integers(min_value=0, max_value=5))

    @settings(max_examples=15, deadline=None)
    @given(
        lrows=st.lists(keys, min_size=0, max_size=25),
        rrows=st.lists(keys, min_size=0, max_size=12),
        hot=st.lists(st.integers(min_value=0, max_value=7), max_size=3, unique=True),
        strategy=st.sampled_from(["broadcast", "salt"]),
    )
    def check(lrows, rrows, hot, strategy):
        left = spark.createDataFrame(
            [(k, i) for i, k in enumerate(lrows)] or [(None, -1)], "k long, v long"
        )
        right = spark.createDataFrame(
            [(k, i * 10) for i, k in enumerate(rrows)] or [(None, -1)], "rk long, w long"
        )
        plain = sorted(
            tuple(r)
            for r in left.join(right, F.col("k") == F.col("rk"), "inner")
            .select("k", "v", "rk", "w")
            .collect()
        )
        got = sorted(
            tuple(r)
            for r in skew_safe_join(
                left, right, left_key="k", right_key="rk",
                hot_keys=hot, strategy=strategy, salt_buckets=3,
            ).collect()
        )
        assert got == plain, (lrows, rrows, hot, strategy)

    check()


def test_skew_safe_join_auto_strategy_picks_by_hot_slice_size(spark, skew_join_frames):
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left, right = skew_join_frames
    plain = _rows(left.join(right, F.col("k") == F.col("rk"), "inner").select("k", "v", "rk", "w"))
    # tiny hot slice -> broadcast branch (plan shows the hint)
    out = skew_safe_join(
        left, right, left_key="k", right_key="rk",
        auto_min_share=0.5, strategy="auto",
    )
    assert _rows(out) == plain
    # force the salt fallback: hot slice "too big" at max_broadcast_rows=1
    out2 = skew_safe_join(
        left, right, left_key="k", right_key="rk",
        auto_min_share=0.5, strategy="auto", max_broadcast_rows=1,
    )
    assert _rows(out2) == plain
    p2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "__rsalt" in p2  # the salt branch actually engaged
    with pytest.raises(ValueError, match="auto"):
        skew_safe_join(left, right, left_key="k", right_key="rk",
                       hot_keys=[0], strategy="auto")
