"""Shape checks for the TPC-H-sweep completion queries (q164-q168:
Q2/Q11/Q12/Q16/Q20 adapted to the derived partsupp). Value-level
parity is covered by test_oracle_parity; these assert the plans keep
their scale posture (dims broadcast, no cartesian fact joins, fact
touched once where the docstring claims it) plus the semantics the
oracle can't see locally (exclusion sets, min-selection)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from usajobs_etl_service_spark.session import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q164_min_cost_is_group_min(spark, sf_dir):
    rows = entrymod.queries()["q164_min_cost_supplier"](spark, sf_dir).collect()
    assert rows, "q164 empty at this sf"
    best = {}
    for r in rows:
        best.setdefault(r["p_partkey"], set()).add(r["supplycost"])
    # equality join back against the group min: every emitted cost for a
    # part is THE minimum, so each part carries exactly one cost value
    for part, costs in best.items():
        assert len(costs) == 1, (part, costs)


def test_q164_plan_broadcasts_dims_no_cartesian(spark, sf_dir):
    p = _plan(entrymod.queries()["q164_min_cost_supplier"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_q165_single_fact_aggregate_one_row_cross(spark, sf_dir):
    p = _plan(entrymod.queries()["q165_important_stock"](spark, sf_dir))
    assert "CartesianProduct" not in p
    # the only nested-loop join is the 1-row total broadcast
    assert p.count("BroadcastNestedLoopJoin") <= 1


def test_q165_threshold_is_exact_integer(spark, sf_dir):
    df = entrymod.queries()["q165_important_stock"](spark, sf_dir)
    vals = [r["value"] for r in df.collect()]
    assert vals
    # integer-cents end-to-end: every value is an exact multiple of 0.01
    # (tolerance = a few ulps at the value's own magnitude, far below
    # the 1.0 grid spacing of v*100)
    for v in vals:
        assert abs(v * 100 - round(v * 100)) < 1e-7 * max(1.0, abs(v))


def test_q166_counts_partition_late_lineitems(spark, sf_dir):
    df = entrymod.queries()["q166_shipmode_priority"](spark, sf_dir)
    got = df.agg(
        F.sum(F.col("high_line_count") + F.col("low_line_count")).alias("n")
    ).first()["n"]
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    expect = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        )
        .count()
    )
    assert got == expect


def test_q167_excludes_negative_balance_suppliers(spark, sf_dir):
    # plant nothing: the testdata ships suppliers with s_acctbal < 0.
    # Re-run the count WITHOUT the exclusion and check it can only grow.
    df = entrymod.queries()["q167_supplier_part_counts"](spark, sf_dir)
    with_excl = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"] for r in df.collect()
    }
    pairs = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 5, 11, 15, 21, 28, 37, 44)
    )
    no_excl = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in pairs.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .collect()
    }
    assert set(with_excl) <= set(no_excl)
    assert all(with_excl[k] <= no_excl[k] for k in with_excl)


def test_q167_anti_join_is_broadcast(spark, sf_dir):
    p = _plan(entrymod.queries()["q167_supplier_part_counts"](spark, sf_dir))
    assert "CartesianProduct" not in p
    # the NOT-IN exclusion set is a handful of rows — must not shuffle
    # the distinct pair set to execute it
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_q168_qualifying_suppliers_shipped_widgets(spark, sf_dir):
    df = entrymod.queries()["q168_potential_promotion"](spark, sf_dir)
    qual = {r["s_suppkey"] for r in df.collect()}
    if not qual:
        return
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    widget_shippers = {
        r["l_suppkey"]
        for r in li.join(
            F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
        )
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    assert qual <= widget_shippers


def test_q168_one_pass_over_fact(spark, sf_dir):
    # both year slices come from ONE conditional aggregate, not two
    # scans: the plan reads lineitem exactly twice in total (the flows
    # aggregate + nothing else touches it; supplier path reads dims only)
    p = _plan(entrymod.queries()["q168_potential_promotion"](spark, sf_dir))
    assert p.count("lineitem.parquet") <= 1 or p.count("Scan parquet") <= 2


def test_gopher_flags_hand_case(spark):
    from usajobs_etl_service_spark.functions.text import gopher_flags

    # 4 words, mean len (3+2+3+4)/4 = 3.0, one non-alpha word, one
    # stopword hit ('the'), one '#' symbol
    df = spark.createDataFrame([("the 42 cat say#",)], ["text"])
    fl = gopher_flags(
        F.col("text"), min_words=4, min_stop_hits=1, min_alpha_word_frac=0.7
    )
    row = df.select(
        fl["n_words"].alias("n"),
        fl["mean_word_len"].alias("mwl"),
        fl["alpha_word_frac"].alias("awf"),
        fl["symbol_ratio"].alias("sr"),
        fl["stop_hits"].alias("sh"),
        fl["passes"].alias("p"),
    ).first()
    assert row["n"] == 4
    assert abs(row["mwl"] - 3.0) < 1e-9
    assert abs(row["awf"] - 0.75) < 1e-9
    assert abs(row["sr"] - 0.25) < 1e-9
    assert row["sh"] == 1
    # symbol_ratio 0.25 > 0.1 kills it despite every other rule passing
    assert row["p"] is False


def test_gopher_gate_word_count_bound(spark):
    from usajobs_etl_service_spark.functions.text import gopher_flags

    short = "the cat sat"
    long_ok = " ".join(["the"] * 30 + ["with"] * 30)
    df = spark.createDataFrame([(1, short), (2, long_ok)], ["doc_id", "text"])
    fl = gopher_flags(F.col("text"))
    rows = {r["doc_id"]: r["p"] for r in df.select("doc_id", fl["passes"].alias("p")).collect()}
    assert rows[1] is False  # 3 words < 50
    assert rows[2] is True  # 60 words, mean len 3.5, 2 stopword types


def test_c4_flags_hand_goldens(spark):
    """Literal C4 rule goldens (the reference test_unit.py:34-65
    validation-golden pattern): each rule exercised by a hand document
    with the expected flag values spelled out."""
    from usajobs_etl_service_spark.functions.text import c4_flags

    docs = [
        # doc 1: two good lines -> 2 kept, 2 sentences, passes
        (1, "Here are five good words.\nAnother line with five words!"),
        # doc 2: terminal punct but only 4 words -> line dropped
        (2, "Only four words here.\nGood line with five words."),
        # doc 3: five words, no terminal punctuation -> dropped line
        (3, "five words but no period\nGood line with five words."),
        # doc 4: javascript line dropped; doc flag set but doc passes
        (4, "Enable javascript to continue reading.\nGood line with five words."),
        # doc 5: lorem ipsum kills the whole document
        (5, "Lorem ipsum dolor sit amet.\nGood line with five words."),
        # doc 6: curly brace kills the whole document
        (6, "function f() { return 1; }\nGood line with five words."),
        # doc 7: no sentences at all (min_sentences) -> fails
        (7, "no terminal punctuation anywhere at all\nshort line"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fl = c4_flags(F.col("text"), min_words_per_line=5, min_sentences=2)
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            fl["n_lines"].alias("nl"),
            fl["n_kept_lines"].alias("kept"),
            fl["n_sentences"].alias("sent"),
            fl["has_lorem_ipsum"].alias("lor"),
            fl["has_curly_brace"].alias("brc"),
            fl["has_javascript"].alias("js"),
            fl["passes"].alias("p"),
        ).collect()
    }
    assert (rows[1]["nl"], rows[1]["kept"], rows[1]["sent"], rows[1]["p"]) == (2, 2, 2, True)
    assert (rows[2]["kept"], rows[2]["p"]) == (1, True)   # 2 sentences still
    assert (rows[3]["kept"], rows[3]["sent"], rows[3]["p"]) == (1, 1, False)
    assert (rows[4]["kept"], rows[4]["js"], rows[4]["p"]) == (1, True, True)
    assert (rows[5]["lor"], rows[5]["p"]) == (True, False)
    assert (rows[6]["brc"], rows[6]["p"]) == (True, False)
    assert (rows[7]["kept"], rows[7]["sent"], rows[7]["p"]) == (0, 0, False)


def test_c4_flags_empty_and_quote_terminal(spark):
    from usajobs_etl_service_spark.functions.text import c4_flags

    docs = [
        (1, ""),                                   # empty doc: nothing kept
        (2, 'He said "five words right here."'),   # quote-terminal line kept
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fl = c4_flags(F.col("text"), min_sentences=1)
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", fl["n_kept_lines"].alias("kept"), fl["passes"].alias("p")
    ).collect()}
    assert (rows[1]["kept"], rows[1]["p"]) == (0, False)
    assert (rows[2]["kept"], rows[2]["p"]) == (1, True)
