"""Merge/upsert algebraic invariants across randomized batches:
metrics add up, counts balance, idempotence holds."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.sinks.upsert import merge_upsert, prepare_batch, upsert_stats


def _rows(rng, keys):
    return [(f"https://jobs/{k}", f"title-{rng.randrange(1000)}") for k in keys]


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_merge_invariants(spark, seed):
    rng = random.Random(seed)
    base_keys = rng.sample(range(100), 40)
    batch_keys = [rng.randrange(130) for _ in range(30)]  # overlaps + news + in-batch dups
    schema = "position_uri string, position_title string"
    base = spark.createDataFrame(_rows(rng, base_keys), schema)
    batch = spark.createDataFrame(_rows(rng, batch_keys), schema)

    stats = upsert_stats(base, batch, ["position_uri"])
    n_batch_distinct = prepare_batch(batch, ["position_uri"]).count()
    n_overlap = len(set(base_keys) & set(batch_keys))

    # metrics add up exactly
    assert stats["inserted"] + stats["updated"] == stats["total"] == n_batch_distinct
    assert stats["updated"] == n_overlap

    merged = merge_upsert(base, batch, ["position_uri"])
    # count balances: base + inserted
    assert merged.count() == base.count() + stats["inserted"]
    # keys unique after merge
    assert merged.select("position_uri").distinct().count() == merged.count()

    # idempotence: merging the merged batch again -> zero inserts
    stats2 = upsert_stats(merged, prepare_batch(batch, ["position_uri"]), ["position_uri"])
    assert stats2["inserted"] == 0
    merged2 = merge_upsert(merged, prepare_batch(batch, ["position_uri"]), ["position_uri"])
    assert merged2.count() == merged.count()
    # last-writer-wins: every batch key's title comes from the batch
    batch_titles = {
        r["position_uri"]: r["position_title"]
        for r in prepare_batch(batch, ["position_uri"]).collect()
    }
    for r in merged.filter(F.col("position_uri").isin(list(batch_titles))).collect():
        assert r["position_title"] == batch_titles[r["position_uri"]]


def test_merge_upsert_hot_key_protection_identical(spark):
    """merge_upsert(hot_keys=...) must equal the plain shuffled merge:
    a base with an 80%-share hot key routes that key's anti-join
    through the broadcast key-set branch, changing the plan, never the
    rows. Validations: broadcast_batch=True and composite keys are
    rejected up front (a silently-ignored knob would fake protection)."""
    import pytest
    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.sinks.upsert import merge_upsert

    base = spark.range(10_000).select(
        F.when(F.col("id") % 5 == 0, F.col("id")).otherwise(F.lit(0)).alias("job_id"),
        F.col("id").alias("payload"),
    )
    batch = spark.range(0, 100, 10).select(
        F.col("id").alias("job_id"), (F.col("id") + 100_000).alias("payload")
    )
    plain = sorted(
        tuple(r)
        for r in merge_upsert(base, batch, ["job_id"], broadcast_batch=False).collect()
    )
    prot = sorted(
        tuple(r)
        for r in merge_upsert(
            base, batch, ["job_id"], broadcast_batch=False, hot_keys=[0]
        ).collect()
    )
    assert prot == plain
    hk = spark.createDataFrame([(0,)], "key long")
    lazy = sorted(
        tuple(r)
        for r in merge_upsert(
            base, batch, ["job_id"], broadcast_batch=False, hot_keys_from=hk
        ).collect()
    )
    assert lazy == plain
    with pytest.raises(ValueError, match="broadcast"):
        merge_upsert(base, batch, ["job_id"], hot_keys=[0])
    base2 = base.withColumn("k2", F.lit(1))
    batch2 = batch.withColumn("k2", F.lit(1))
    with pytest.raises(ValueError, match="single-key"):
        merge_upsert(
            base2, batch2, ["job_id", "k2"], broadcast_batch=False, hot_keys=[0]
        )
