"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The published recipe for picking pretraining documents that *look like*
a target domain without training a classifier: featurize every document
into hashed n-gram buckets, fit two bag-of-buckets unigram models —
one on the target sample, one on the raw pool — and score each raw
document by its importance log-ratio

    w(doc) = sum_{token t in doc} log p_target(b(t)) - log p_raw(b(t))

with add-alpha smoothing on both models. High-w documents are
distributionally closest to the target; selection keeps the top-k (the
paper resamples proportionally to exp(w); the deterministic top-k
variant below is the reproducible analog, same ranking).

The reference engine has no selection surface (its filter is the
NOT-NULL validation gate, reference ``etl/etl.py:214-224``); this
extends the curation family (quality gate sampling.py:57, surprisal
retrieval.py:120, KL divergence q142) with the importance-weighting
recipe those build toward.

Scale shape (no UDFs, no collect):

- Bucket counts for both models are ONE shuffle each keyed by
  ``bucket`` — map-side combine caps every task's output at ``width``
  rows, so the exchanges move ≤ width rows per task at any corpus size.
- The log-ratio table is ≤ ``width`` rows BY CONSTRUCTION, so its join
  onto the exploded token stream is a sound explicit broadcast (unlike
  open-vocabulary term stats, which this repo deliberately never
  broadcasts — hashing to a fixed width is what makes the broadcast
  provable).
- Model totals ride as a 1-row broadcast (the bm25/q121 scalar
  pattern).
- The per-document sum is one ``doc_id`` shuffle; at 100 TB the
  log-ratio lookup could fold into the scan stage as a literal map
  (the pq.py codebook pattern) making scoring shuffle-free, but the
  join form keeps the plan readable and the exchange is row-bounded
  anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from usajobs_etl_service_spark.functions.text import tokens_ws


def dsir_bucket(token: Column, width: int) -> Column:
    """Hashed-unigram feature bucket: repo-standard md5-prefix hash
    (sampling.py:23) of ``token#dsir`` mod width — engine-reproducible
    so the DuckDB oracle rebuilds identical models."""
    h = F.conv(
        F.substring(F.md5(F.concat(token.cast("string"), F.lit("#dsir"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % F.lit(width)


def dsir_importance(
    df: DataFrame,
    target_cond: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """Importance log-ratio per document: ``(doc_id, importance double)``.

    ``target_cond`` marks the in-domain sample (a boolean Column over
    ``df``'s rows, e.g. ``F.col("lang") == "en"``); the raw model is fit
    on ALL rows. Documents with no tokens are dropped (no features — the
    paper's featurizer does the same).
    """
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        target_cond.alias("is_target"),
        F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("token"),
    ).filter(F.col("token") != "")
    feats = toks.select(
        "doc_id", "is_target", dsir_bucket(F.col("token"), width).alias("bucket")
    )

    # Both models in ONE bucket-keyed aggregation: raw = all tokens,
    # target = the flagged subset (conditional count), so the corpus is
    # read and shuffled once, not twice.
    counts = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.count_if(F.col("is_target")).alias("tgt_cnt"),
    )
    totals = counts.agg(
        F.sum("raw_cnt").alias("raw_total"), F.sum("tgt_cnt").alias("tgt_total")
    )
    # 1-row broadcast for the smoothing denominators.
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("tgt_cnt") + F.lit(alpha)) / (F.col("tgt_total") + F.lit(alpha * width)))
            - F.log((F.col("raw_cnt") + F.lit(alpha)) / (F.col("raw_total") + F.lit(alpha * width)))
        ).alias("log_ratio"),
    )

    scored = feats.join(F.broadcast(ratio), "bucket")  # ratio ≤ width rows
    return scored.groupBy("doc_id").agg(F.sum("log_ratio").alias("importance"))


def dsir_select(
    df: DataFrame,
    target_cond: Column,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 4096,
    alpha: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic top-k selection by importance: returns
    ``(doc_id, importance)`` with importance rounded to
    ``round_digits`` and ties broken by doc_id ASC, so the selected
    set is identical across engines and runs (duplicate documents tie
    exactly). Plans as TakeOrderedAndProject — no full sort."""
    imp = dsir_importance(
        df, target_cond, id_col=id_col, text_col=text_col, width=width, alpha=alpha
    ).select("doc_id", F.round("importance", round_digits).alias("importance"))
    return imp.orderBy(F.col("importance").desc(), F.col("doc_id").asc()).limit(k)
