"""Sequence packing for training-data pipelines: assign chunks to
fixed-size context windows ("bins") so short sequences don't waste
padded tokens.

Greedy sequential packing: within a shard, chunks are laid end-to-end
in deterministic (doc_id, chunk_id) order and a chunk belongs to the
bin where its start offset lands (``floor(start / context_tokens)``).
A chunk may straddle a boundary — the trainer's loader splits it — so
bins fill to ~100%; packing quality is measured, not guessed
(``packing_stats``).

Scale shape: a single global ordering would funnel 100 TB through one
window partition. Sharding by hashed doc_id keeps every shard's
cumulative sum independent — one hash-partition shuffle, each shard a
separate window partition — at the cost of at most one underfull final
bin per shard. Bin ids are globally unique as (shard, bin_in_shard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    chunks: DataFrame,
    *,
    context_tokens: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
    shard_expr: Column | None = None,
) -> DataFrame:
    """Add ``shard``, ``start_offset`` (within shard), and ``bin_id``
    (within shard) to each chunk row. ``shard_expr`` overrides the
    default hashed-doc shard (any deterministic doc-level expression)."""
    if context_tokens <= 0:
        raise ValueError("context_tokens must be positive")
    shard = shard_expr if shard_expr is not None else F.pmod(
        F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc(), F.col(chunk_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_shard = chunks.withColumn("shard", shard)
    cum = F.sum(F.col(tokens_col)).over(w)
    return with_shard.withColumn("start_offset", (cum - F.col(tokens_col)).cast("long")).withColumn(
        "bin_id", F.floor(F.col("start_offset") / context_tokens)
    )


def packing_stats(
    packed: DataFrame,
    *,
    context_tokens: int = 256,
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-bin packing quality: chunks per bin, tokens that start in the
    bin, and fill ratio (>1 means the last chunk straddles into the
    next bin; the final bin per shard is the only systematically
    underfull one)."""
    return (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(tokens_col).alias("bin_tokens"),
        )
        .withColumn("fill_ratio", F.round(F.col("bin_tokens") / context_tokens, 4))
    )
