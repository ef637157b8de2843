"""Cross-document duplicated-substring detection (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better").

The published recipe finds repeated substrings across a corpus with a
suffix array; the distributed re-expression here is positional n-gram
fingerprinting: every word ``n``-gram that occurs in >= ``min_docs``
DISTINCT documents marks its token span as duplicated, and runs of
consecutive duplicated positions merge into maximal spans (a duplicated
substring of L >= n tokens is exactly a run of L - n + 1 duplicated
n-grams, so maximal-span merging recovers the full repeated substring,
not just its first window).

Scale shape (all built-in expressions, one structural shuffle):
- Per-doc gram hashes are two projections (hash each token once, then
  one ``xxhash64`` over n token-hashes per position — the decontam
  lesson: no per-gram string slicing) — no shuffle.
- "Gram seen in >= k distinct docs" is distinct (gram, doc) pairs ->
  partial-aggregated count per gram: ONE hash shuffle on the 8-byte
  gram key, carrying ids only — never gram strings. The duplicated-gram
  set is open-vocabulary (it grows with the corpus), so it is joined
  with a shuffle semi-join, NOT broadcast — the same deliberate call as
  the q62 TF-IDF vocabulary.
- Span merging is the classic gaps-and-islands window per doc
  (pos - row_number() is constant within a consecutive run): one
  shuffle on doc_id, spill-safe, no self-joins.

Hash note: grams are compared by 64-bit fingerprint. A cross-doc
collision needs two distinct grams with equal xxhash64 — p ~ 1e-13 at
bench corpus sizes (the q83 argument); at 100 TB the same pipeline
carries ~2 extra bytes by widening to a 128-bit pair of hashes if a
workload demands it.

Reference parity note: the reference engine has no corpus-dedup
surface; this extends SURVEY §2.11's training-data family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usajobs_etl_service_spark.functions.text import tokens_ws


def _positional_gram_hashes(
    df: DataFrame, *, id_col: str, text_col: str, n: int
) -> DataFrame:
    """One row per (doc, 1-based token position, gram-hash). Documents
    shorter than ``n`` tokens produce no rows."""
    hashed = df.withColumn(
        "__th", F.transform(tokens_ws(F.lower(F.col(text_col))), lambda t: F.xxhash64(t))
    )
    th = F.col("__th")
    starts = F.sequence(F.lit(0), F.size(th) - n, F.lit(1))
    grams = F.transform(starts, lambda s: F.xxhash64(*[F.get(th, s + j) for j in range(n)]))
    gram_arr = F.when(F.size(th) >= n, grams).otherwise(F.array().cast("array<bigint>"))
    return hashed.select(
        F.col(id_col), F.posexplode(gram_arr).alias("pos0", "g")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "g")


def duplicated_gram_positions(
    docs: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """(doc, pos) of every ``n``-gram occurring in >= ``min_docs``
    distinct documents. ``min_docs=2`` = cross-document duplication
    (a gram repeated only WITHIN one doc does not qualify — that
    signal is operators/repetition.py's job)."""
    grams = _positional_gram_hashes(docs, id_col=id_col, text_col=text_col, n=n)
    # count_distinct plans as partial-distinct below ONE exchange on g;
    # a distinct() + groupBy would shuffle twice ((g,doc) then g)
    dup_grams = (
        grams.groupBy("g")
        .agg(F.count_distinct(F.col(id_col)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("g")
    )
    return grams.join(dup_grams, "g", "left_semi").select(id_col, "pos")


def duplicated_spans(
    docs: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document:
    ``(doc, span_start, span_end, span_len)`` in 1-based token offsets,
    each span a maximal run of consecutive duplicated-gram positions
    (span_end = last duplicated position + n - 1). These are the spans
    Lee et al. cut out of training documents; a caller drops the span,
    the doc (if span_len/doc_len is high), or nothing — policy stays
    outside the detector."""
    from pyspark.sql import Window

    p = duplicated_gram_positions(
        docs, n=n, id_col=id_col, text_col=text_col, min_docs=min_docs
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = p.withColumn("island", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + n).alias("span_len"),
        )
        .drop("island")
    )


def duplicated_gram_stats(
    docs: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """Per-document duplication profile: ``(doc, n_grams, n_dup_grams,
    dup_frac)`` for every doc with >= n tokens. ``dup_frac`` is the
    curation knob (drop docs above a duplication budget)."""
    grams = _positional_gram_hashes(docs, id_col=id_col, text_col=text_col, n=n)
    dup = duplicated_gram_positions(
        docs, n=n, id_col=id_col, text_col=text_col, min_docs=min_docs
    )
    totals = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    dups = dup.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_grams"))
    return (
        totals.join(dups, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_dup_grams"), F.lit(0)).alias("n_dup_grams"),
            F.round(
                F.coalesce(F.col("n_dup_grams"), F.lit(0)) / F.col("n_grams"),
                round_digits,
            ).alias("dup_frac"),
        )
    )
