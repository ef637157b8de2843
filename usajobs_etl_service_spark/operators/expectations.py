"""Declarative data-quality expectations — the Great-Expectations-
shaped release gate: a rule set evaluated in ONE aggregate pass over
the table, emitting a per-rule violations report. The generalization
of the reference's hardwired NOT-NULL validation gate
(etl/etl.py:214-224) into a rule table any pipeline stage can declare.

Semantics: a row PASSES a rule iff the rule's condition evaluates
TRUE; FALSE and NULL both count as violations (a NULL price is not a
price > 0 — the null-hostile reading every data contract wants; wrap
a condition in ``coalesce(cond, lit(True))`` to opt a rule out of
that).

Scale shape: all rules compile into a single ``agg`` over one scan —
``count_if(NOT coalesce(cond, false))`` per rule — so a 50-rule
contract costs exactly one pass and zero shuffles beyond the scalar
reduction. Cross-table rules (referential integrity) are a join by
nature: ``fk_violations`` counts left keys missing from the dimension
via a left_anti join (the q15/q116 shape) and returns a one-row frame
UNION-compatible with the rule report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expect_report", "fk_violations"]


def expect_report(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate ``rules`` (name, boolean Column) in one pass:
    ``(rule, n_rows, n_violations, pass)`` — one output row per rule,
    in rule order (a ``rule_seq`` column keeps the order stable for
    display and diffing)."""
    if not rules:
        raise ValueError("need at least one rule")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in {names}")
    bad = [n for n in names if "'" in n or "\\" in n]
    if bad:
        # names are embedded as string literals in the stack() expr
        raise ValueError(f"rule names must not contain quotes/backslashes: {bad}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, cond) in enumerate(rules):
        aggs.append(
            F.count_if(~F.coalesce(cond, F.lit(False))).alias(f"__v{i}")
        )
    red = df.agg(*aggs)
    stack = ", ".join(
        f"{i}, '{name}', __v{i}" for i, (name, _) in enumerate(rules)
    )
    return red.selectExpr(
        "__n",
        f"stack({len(rules)}, {stack}) AS (rule_seq, rule, n_violations)",
    ).select(
        "rule_seq",
        "rule",
        F.col("__n").alias("n_rows"),
        "n_violations",
        (F.col("n_violations") == 0).alias("pass"),
    )


def fk_violations(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    rule: str,
) -> DataFrame:
    """Referential-integrity rule as a one-row report frame (same
    schema as :func:`expect_report` rows, rule_seq = -1 so callers
    can UNION and sort it in front): fact rows whose key has no match
    in the dimension. NULL fact keys count as violations (a fact row
    pointing nowhere), counted without the join."""
    n_rows = fact.count()
    nulls = fact.filter(F.col(fact_key).isNull()).count()
    missing = (
        fact.filter(F.col(fact_key).isNotNull())
        .join(
            dim.select(F.col(dim_key).alias(fact_key)).distinct(),
            fact_key,
            "left_anti",
        )
        .count()
    )
    spark = fact.sparkSession
    v = nulls + missing
    return spark.createDataFrame(
        [(-1, rule, n_rows, v, v == 0)],
        ["rule_seq", "rule", "n_rows", "n_violations", "pass"],
    )
