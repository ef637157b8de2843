"""Benchmark decontamination for training corpora: drop (or flag)
documents that share an n-gram with any evaluation/benchmark text.

The standard pretraining-hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap): a document is "contaminated" if any of its word
n-grams appears in the benchmark set.

Scale shape: benchmark n-grams are a small set — hash each to a 64-bit
key and broadcast; documents explode to (doc, gram-hash) and hit the
broadcast semi-join, so the corpus is scanned once, shuffles nothing,
and carries 8-byte longs instead of gram strings. Explicitly NOT an
all-pairs text comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usajobs_etl_service_spark.functions.text import tokens_ws


def _gram_hashes(text_col, n: int):
    """xxhash64 of each word n-gram of ``text_col`` (lowercased);
    documents shorter than ``n`` tokens produce no grams (guarded —
    ``sequence`` with stop < start is an error under ANSI)."""
    toks = tokens_ws(F.lower(text_col))
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1), F.lit(1))
    grams = F.transform(starts, lambda s: F.xxhash64(F.array_join(F.slice(toks, s, n), " ")))
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<bigint>"))


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """doc ids sharing at least one word ``n``-gram with any benchmark
    row. Documents shorter than ``n`` tokens cannot match."""
    bench_grams = (
        benchmark.select(F.explode(_gram_hashes(F.col(bench_text_col), n)).alias("g")).distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(_gram_hashes(F.col(text_col), n)).alias("g")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """The corpus minus contaminated documents (anti-join on doc id)."""
    bad = contaminated_docs(
        docs, benchmark, n=n, id_col=id_col, text_col=text_col, bench_text_col=bench_text_col
    )
    return docs.join(bad, id_col, "left_anti")
