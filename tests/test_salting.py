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


# ------------------------------------------------- semi/anti + lazy hot keys


def test_skew_safe_join_semi_anti_match_plain(spark, skew_join_frames):
    """left_semi/left_anti (the J1 merge's scale shape) must equal the
    plain join for explicit hot keys — including a hot key ABSENT from
    the right side (the anti case the inner path's pair counts can
    never even see)."""
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left, right = skew_join_frames
    # drop the hot key from the right to make anti non-trivial too
    right_no_hot = right.filter(F.col("rk") != 0)
    for how in ("left_semi", "left_anti"):
        for r in (right, right_no_hot):
            plain = _rows(left.join(r, F.col("k") == F.col("rk"), how))
            got = _rows(
                skew_safe_join(
                    left, r, left_key="k", right_key="rk", how=how, hot_keys=[0]
                )
            )
            assert got == plain, how
            assert [c for c in left.columns] == ["k", "v"]


def test_skew_safe_join_semi_anti_auto_detects_either_side(spark):
    """Mode-aware auto-detect: a key hot on the LEFT (80% share) and a
    key hot only on the RIGHT must both route to the key-set branch;
    results equal plain semi/anti."""
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, F.col("id")).otherwise(F.lit(0)).alias("k"),
        F.col("id").alias("v"),
    )
    # right: key 7770 is right-hot (600 dup rows), plus sparse keys;
    # hot LEFT key 0 is absent from right entirely
    right = (
        spark.range(600).select(F.lit(7770).alias("rk"))
        .unionByName(spark.range(0, 1000, 20).select(F.col("id").alias("rk")))
    )
    for how in ("left_semi", "left_anti"):
        plain = _rows(left.join(right, F.col("k") == F.col("rk"), how))
        got = _rows(
            skew_safe_join(
                left, right, left_key="k", right_key="rk", how=how,
                auto_min_share=0.3,
            )
        )
        assert got == plain, how


def test_skew_safe_join_semi_hot_branch_is_broadcast_keyset(spark, skew_join_frames):
    """Plan pin: the semi/anti hot branch joins against a BROADCAST
    key-set (BroadcastHashJoin LeftSemi/LeftAnti) — the skewed left
    rows never shuffle even with auto-broadcast off."""
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left, right = skew_join_frames
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for how, tag in (("left_semi", "LeftSemi"), ("left_anti", "LeftAnti")):
            out = skew_safe_join(
                left, right, left_key="k", right_key="rk", how=how, hot_keys=[0]
            )
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan, how
            assert tag in plan, how
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_skew_safe_join_property_semi_anti(spark):
    """Property: for ANY key distribution and hot set, semi and anti
    equal the plain join (explicit keys and the lazy hot_keys_from
    frame both)."""
    from hypothesis import given, settings, strategies as st

    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    keys = st.one_of(st.none(), st.integers(min_value=0, max_value=5))

    def srt(df):
        # anti output legitimately carries NULL keys (they never match,
        # so anti KEEPS them) — sort None-safely
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    @settings(max_examples=12, deadline=None)
    @given(
        lrows=st.lists(keys, min_size=0, max_size=20),
        rrows=st.lists(keys, min_size=0, max_size=10),
        hot=st.lists(st.integers(min_value=0, max_value=7), max_size=3, unique=True),
        how=st.sampled_from(["left_semi", "left_anti"]),
        lazy=st.booleans(),
    )
    def check(lrows, rrows, hot, how, lazy):
        left = spark.createDataFrame(
            [(k, i) for i, k in enumerate(lrows)] or [(None, -1)], "k long, v long"
        )
        right = spark.createDataFrame(
            [(k, i * 10) for i, k in enumerate(rrows)] or [(None, -1)], "rk long, w long"
        )
        plain = srt(left.join(right, F.col("k") == F.col("rk"), how))
        if lazy:
            hk = spark.createDataFrame([(k,) for k in hot] or [(None,)], "key long")
            out = skew_safe_join(
                left, right, left_key="k", right_key="rk", how=how, hot_keys_from=hk
            )
        else:
            out = skew_safe_join(
                left, right, left_key="k", right_key="rk", how=how, hot_keys=hot
            )
        assert srt(out) == plain, (lrows, rrows, hot, how, lazy)

    check()


def test_skew_safe_join_hot_keys_from_is_lazy_and_correct(spark, skew_join_frames):
    """hot_keys_from must build the whole plan WITHOUT running a job
    (the saved-report pipeline shape); results equal the eager isin
    split, including via join_skew_report(render_key=False)."""
    from usajobs_etl_service_spark.operators.salting import (
        join_skew_report,
        skew_safe_join,
    )

    left, right = skew_join_frames
    sc = spark.sparkContext
    group = "lazy_hot_keys_probe"
    sc.setJobGroup(group, "construction must run no job")
    try:
        hk = spark.createDataFrame([(0,)], "key long")
        out = skew_safe_join(
            left, right, left_key="k", right_key="rk", hot_keys_from=hk
        )
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert jobs == [], jobs  # construction ran NO job
        plain = _rows(
            left.join(right, F.col("k") == F.col("rk"), "inner").select("k", "v", "rk", "w")
        )
        assert _rows(out) == plain
        # sanity: the collect itself DID run jobs in this group
        assert sc.statusTracker().getJobIdsForGroup(group) != []
    finally:
        sc.setJobGroup("", "")
    # a saved report (raw keys) drives the same split
    rep = join_skew_report(
        left, right, left_key="k", right_key="rk", render_key=False
    ).filter(F.col("pct_of_output") >= 0.5)
    out2 = skew_safe_join(
        left, right, left_key="k", right_key="rk", hot_keys_from=rep
    )
    assert _rows(out2) == _rows(
        left.join(right, F.col("k") == F.col("rk"), "inner").select("k", "v", "rk", "w")
    )
    # NULL rows in the frame are filtered, not table-dropping
    hk_null = spark.createDataFrame([(0,), (None,)], "key long")
    out3 = skew_safe_join(
        left, right, left_key="k", right_key="rk", hot_keys_from=hk_null
    )
    assert _rows(out3) == _rows(
        left.join(right, F.col("k") == F.col("rk"), "inner").select("k", "v", "rk", "w")
    )


def test_skew_safe_join_hot_keys_from_validations(spark, skew_join_frames):
    from usajobs_etl_service_spark.operators.salting import skew_safe_join

    left, right = skew_join_frames
    hk = spark.createDataFrame([(0,)], "key long")
    with pytest.raises(ValueError, match="not both"):
        skew_safe_join(
            left, right, left_key="k", right_key="rk",
            hot_keys=[0], hot_keys_from=hk,
        )
    with pytest.raises(ValueError, match="auto"):
        skew_safe_join(
            left, right, left_key="k", right_key="rk",
            hot_keys_from=hk, strategy="auto",
        )
    # lossy key-frame dtype rejected like a lossy right key
    hk_d = spark.createDataFrame([(0.0,)], "key double")
    with pytest.raises(ValueError, match="incoercible"):
        skew_safe_join(
            left, right, left_key="k", right_key="rk", hot_keys_from=hk_d
        )
