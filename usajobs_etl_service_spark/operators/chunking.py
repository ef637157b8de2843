"""Document chunking for training-data pipelines: split each document
into fixed-size token windows with overlap (the standard prep step
before tokenization/packing for LLM pretraining).

Pure built-in expressions — tokenize once, compute chunk start
positions with ``sequence``, slice per start with ``transform`` +
``slice``, then one ``posexplode``. Runs entirely inside the scan
stage: no shuffle, no UDF, linear in corpus bytes; at 100 TB this
chunks as fast as parquet can be read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usajobs_etl_service_spark.functions.text import tokens_ws


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap_tokens: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): ``(id, chunk_id, chunk_text,
    n_tokens)``. Chunks start every ``chunk_tokens - overlap_tokens``
    tokens; the last chunk may be short; empty documents yield no
    chunks. ``chunk_id`` is 0-based and contiguous per document.

    Starts are capped at ``n_tokens - overlap_tokens`` so every chunk
    contributes at least one token beyond the previous chunk's end: a
    start inside the final chunk's overlap region would emit a tail
    chunk wholly contained in its predecessor — pure duplicated
    training content (every token is still covered; only the redundant
    tail is dropped)."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(f"need 0 <= overlap_tokens ({overlap_tokens}) < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap_tokens
    base = df.select(F.col(id_col), tokens_ws(F.col(text_col)).alias("__toks")).filter(
        F.size(F.col("__toks")) > 0
    )
    t = F.col("__toks")
    # 1-based slice starts: 1, 1+stride, ... while start <= n_tokens - overlap
    # (chunks starting past that bound add zero new tokens)
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(t) - F.lit(overlap_tokens), F.lit(1)), F.lit(stride)
    )
    chunks = F.transform(starts, lambda s: F.slice(t, s, chunk_tokens))
    exploded = base.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "__chunk"))
    return exploded.select(
        id_col,
        "chunk_id",
        F.array_join(F.col("__chunk"), " ").alias("chunk_text"),
        F.size(F.col("__chunk")).alias("n_tokens"),
    )
