"""Sequence packing: deterministic shard/bin assignment, exact model
parity, and fill quality on real chunked documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.chunking import chunk_documents
from usajobs_etl_service_spark.operators.packing import pack_chunks, packing_stats


def test_single_shard_model(spark):
    # 5 chunks of 100 tokens into 256-token bins, one shard:
    # starts 0,100,200,300,400 -> bins 0,0,0,1,1
    rows = [(1, i, "x", 100) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id int, chunk_text string, n_tokens int")
    packed = pack_chunks(df, context_tokens=256, n_shards=1).orderBy("chunk_id").collect()
    assert [r["start_offset"] for r in packed] == [0, 100, 200, 300, 400]
    assert [r["bin_id"] for r in packed] == [0, 0, 0, 1, 1]


def test_shards_partition_docs_not_chunks(spark):
    rows = [(d, c, "x", 10) for d in range(20) for c in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id int, chunk_text string, n_tokens int")
    packed = pack_chunks(df, context_tokens=64, n_shards=4)
    # all chunks of a doc land in one shard
    assert packed.groupBy("doc_id").agg(F.countDistinct("shard").alias("n")).filter(F.col("n") > 1).count() == 0
    # offsets within each shard are dense: max(start)+last tokens == sum(tokens)
    per_shard = packed.groupBy("shard").agg(
        (F.max("start_offset")).alias("max_start"), F.sum("n_tokens").alias("tot")
    )
    for r in per_shard.collect():
        assert r["max_start"] == r["tot"] - 10  # every chunk is 10 tokens


def test_fill_ratio_on_real_chunks(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = chunk_documents(docs, chunk_tokens=32, overlap_tokens=0)
    packed = pack_chunks(chunks, context_tokens=256, n_shards=4)
    stats = packing_stats(packed, context_tokens=256)
    # a non-final bin owns at least ctx - (max_chunk - 1) tokens (a
    # straddling chunk's remainder occupies its start but is owned by
    # the previous bin); only the final bin per shard may be emptier
    n_shards = stats.select("shard").distinct().count()
    floor_ratio = (256 - 31) / 256
    underfull = stats.filter(F.col("fill_ratio") < floor_ratio).count()
    assert underfull <= n_shards
    # bin ids contiguous from 0 per shard
    for r in stats.groupBy("shard").agg(F.min("bin_id").alias("lo"), F.max("bin_id").alias("hi"),
                                        F.count(F.lit(1)).alias("n")).collect():
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1


def test_rejects_bad_context(spark):
    df = spark.createDataFrame([(1, 0, "x", 1)], "doc_id long, chunk_id int, chunk_text string, n_tokens int")
    with pytest.raises(ValueError):
        pack_chunks(df, context_tokens=0)
