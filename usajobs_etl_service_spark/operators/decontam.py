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


def _exploded_gram_hashes(df: DataFrame, text_col: str, n: int, keep: list[str]):
    """One row per word ``n``-gram hash. Two-step projection: hash each
    token ONCE into a column, then combine ``n`` token hashes per gram
    with a single ``xxhash64(h_s, ..., h_{s+n-1})`` — no string
    slicing/joining per gram. (Building the gram string inside the
    lambda re-runs the tokenizer work per gram — interpreted, ~10x
    slower; same lesson as the shingle pipeline.) Documents shorter
    than ``n`` tokens produce no grams."""
    hashed = df.withColumn(
        "__th", F.transform(tokens_ws(F.lower(F.col(text_col))), lambda t: F.xxhash64(t))
    )
    th = F.col("__th")
    starts = F.sequence(F.lit(0), F.size(th) - n, F.lit(1))
    grams = F.transform(starts, lambda s: F.xxhash64(*[F.get(th, s + j) for j in range(n)]))
    gram_arr = F.when(F.size(th) >= n, grams).otherwise(F.array().cast("array<bigint>"))
    return hashed.select(*keep, F.explode(gram_arr).alias("g"))


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
    bench_grams = _exploded_gram_hashes(benchmark, bench_text_col, n, keep=[]).distinct()
    doc_grams = _exploded_gram_hashes(docs, text_col, n, keep=[id_col])
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


def contamination_fraction(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """GRADED contamination: per document, the fraction of its DISTINCT
    word ``n``-grams that appear anywhere in the benchmark set — the
    overlap-percentage report behind the binary gate
    (:func:`contaminated_docs`), as published eval-hygiene appendices
    report it (contamination as a per-example overlap percentage, not
    a single bit).

    Same scale shape as the gate: benchmark grams hash to 64-bit keys
    and broadcast; the corpus explodes to distinct (doc, gram-hash)
    rows and takes a broadcast LEFT join (hit bit), then ONE per-doc
    aggregate. The corpus is scanned once and nothing shuffles except
    the per-doc count combine. Documents shorter than ``n`` tokens
    have no grams and are absent from the output (no 0/0 row).

    Fractions are exact integer ratios rounded to 6; cross-engine
    equality holds up to xxhash64 collisions (~1e-13 per distinct-gram
    pair — the q83/q90 argument; an oracle carries gram strings)."""
    bench = _exploded_gram_hashes(benchmark, bench_text_col, n, keep=[]).distinct()
    dg = _exploded_gram_hashes(docs, text_col, n, keep=[id_col]).distinct()
    hit = dg.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "g", "left"
    )
    return (
        hit.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("contam_frac"),
        )
    )


def novelty_profile(
    docs: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram NOVELTY under first-seen attribution: the
    fraction of a document's distinct word n-grams whose first corpus
    occurrence (minimum ``id_col`` among documents containing the
    gram) is this document — the memorization-risk / dedup-residual
    profile behind Lee et al.'s duplicated-text analysis: a crawl
    snapshot's tail of low-novelty documents is exactly what substring
    dedup (q90) and near-dup removal leave behind when thresholds are
    loose. Attribution is deterministic: ties on a shared gram go to
    the lowest doc id (ingestion order at 100 TB — use an ingest_seq).

    Shape: distinct (doc, gram-hash) rows (the :func:`decontaminate`
    explode, 8-byte keys, never gram strings), ONE gram-keyed min
    aggregate for first-seen, one gram-keyed join back (both
    open-vocabulary — no broadcast hints), one per-doc aggregate.
    Cross-engine equality up to xxhash64 collisions (the q83/q90
    argument; the oracle carries gram strings)."""
    dg = _exploded_gram_hashes(docs, text_col, n, keep=[id_col]).distinct()
    first = dg.groupBy("g").agg(F.min(id_col).alias("__first"))
    return (
        dg.join(first, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("__first") == F.col(id_col)).cast("long")).alias("n_novel"),
        )
        .select(
            id_col,
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty_frac"),
        )
    )
