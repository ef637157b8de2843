"""Sub-document unit dedup + reassembly (dedup.unit_dedup_reassemble):
Python replay, boilerplate removal, all-units-lost drop, regex path."""

from __future__ import annotations

import pytest

from usajobs_etl_service_spark.operators.dedup import unit_dedup_reassemble

BOILER = "all rights reserved contact us terms of service apply here now ok fine thanks bye please"  # 16 tokens


def _py(docs, unit_tokens=16):
    seen = set()
    out = {}
    for did, text in sorted(docs):
        toks = text.split()
        units = [
            " ".join(toks[s : s + unit_tokens])
            for s in range(0, max(len(toks), 1), unit_tokens)
        ]
        units = [u for u in units if u.strip()]
        kept = []
        for u in units:
            fp = u.lower()
            if fp not in seen:
                seen.add(fp)
                kept.append(u)
        if kept:
            out[did] = (len(units), len(kept), " ".join(kept))
    return out


@pytest.fixture()
def docs():
    body_a = " ".join(f"alpha{i}" for i in range(20))
    body_b = " ".join(f"beta{i}" for i in range(20))
    return [
        (1, f"{BOILER} {body_a}"),
        (2, f"{BOILER} {body_b}"),  # loses the boilerplate unit only
        (3, BOILER),  # ALL units lose -> doc drops
        (4, ""),  # empty -> no units -> drops
    ]


def test_matches_python_replay(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_units"], r["n_kept"], r["text_dedup"])
        for r in unit_dedup_reassemble(df, unit_tokens=16).collect()
    }
    assert got == _py(docs)
    assert 3 not in got and 4 not in got
    # doc 2 kept its body but lost the shared boilerplate
    assert "beta0" in got[2][2] and "rights" not in got[2][2]
    # doc 1 (first occurrence) keeps everything
    assert got[1][0] == got[1][1]


def test_case_insensitive_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello world")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["n_kept"] for r in unit_dedup_reassemble(df, unit_tokens=4).collect()}
    assert got == {1: 1}  # doc 2's only unit is a case-variant duplicate


def test_regex_split_path(spark):
    df = spark.createDataFrame(
        [(1, "para one\n\npara two"), (2, "para two\n\npara three")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_units"], r["n_kept"], r["text_dedup"])
        for r in unit_dedup_reassemble(df, split_pattern="\n\n+").collect()
    }
    assert got[1] == (2, 2, "para one para two")
    assert got[2] == (2, 1, "para three")


def test_within_doc_duplicates_collapse(spark):
    df = spark.createDataFrame([(1, "x y x y")], ["doc_id", "text"])
    got = unit_dedup_reassemble(df, unit_tokens=2).collect()
    assert got[0]["n_units"] == 2 and got[0]["n_kept"] == 1
    assert got[0]["text_dedup"] == "x y"


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match=">= 1"):
        unit_dedup_reassemble(df, unit_tokens=0)
