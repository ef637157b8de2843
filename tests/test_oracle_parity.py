"""The driver's correctness gate, run locally at sf0.001: every
``queries()`` entry must hash-match its DuckDB ``oracle_sql()``."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.verify_oracle import TABLES, compare


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    result = compare(name, spark, duck, sf_dir)
    assert result.startswith(("OK", "SKIP")), result


# The driver's harness only checks the FIRST 50 registry entries; these
# names (= the CORRECTNESS_r01..r04 keys, in order) cover the whole
# SURVEY §2 core and are frozen — see COVERAGE.md. This test makes a
# refactor that reorders or renames the registry fail loudly instead of
# silently dropping a §2 operator out of the driver's visibility window.
DRIVER_WINDOW_Q01_Q50 = [
    "q01_job_statistics", "q02_metric_union", "q03_group_counts",
    "q04_top_k_recent", "q05_dedup_first_wins", "q06_dedup_exact_fingerprint",
    "q07_recent_view", "q08_like_prefix", "q09_key_lookup",
    "q10_location_render", "q11_remuneration_render", "q12_date_parse",
    "q13_text_search", "q14_join_star", "q15_anti_join", "q16_upsert_merge",
    "q17_merge_metrics", "q18_topk_cosine", "q19_text_stats",
    "q20_flatten_ingest", "q21_window_running", "q22_embedding_near_dup",
    "q23_ngram_jaccard_adjacent", "q24_minhash_near_dup",
    "q25_simhash_near_dup", "q26_lang_id", "q27_quality_score",
    "q28_global_sort_rank", "q29_rollup", "q30_pivot", "q31_set_ops",
    "q32_monitor_display", "q33_json_props", "q34_views_layer",
    "q35_approx_distinct", "q36_ivf_ann", "q37_rest_scan_pipeline",
    "q38_pricing_summary", "q39_top_unshipped", "q40_corpus_curation",
    "q41_windowed_counts", "q42_sessionize", "q43_scalar_subquery",
    "q44_having", "q45_multimodal_features", "q46_native_datasource",
    "q47_asof_join", "q48_window_suite", "q49_percentiles", "q50_map_ops",
]


def test_driver_window_first_50_frozen():
    assert list(entrymod.queries())[:50] == DRIVER_WINDOW_Q01_Q50


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_planted_dup_oracle_queries_cap_counters_zero(spark, sf_dir):
    """q82/q83/q84's oracle-equality claims carry a PRECONDITION: the
    LSH hot-bucket cap must not bind (a saturated bucket drops planted
    pairs wholesale — ADVICE r5). Mirror each query's construction with
    an Observation and assert zero drops on the oracle corpus."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.operators.neardup import (
        embedding_srp_near_dup_pairs,
        minhash_near_dup_pairs,
        simhash_near_dup_pairs,
    )
    from usajobs_etl_service_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    scaled = emb.select(
        (F.col("vec_id") + 10000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    obs_srp = Observation("q82_cap")
    embedding_srp_near_dup_pairs(
        emb.unionByName(scaled), threshold=0.95, observation=obs_srp
    ).write.format("noop").mode("overwrite").save()
    assert obs_srp.get == {"dropped_rows": 0, "dropped_buckets": 0}

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select((F.col("doc_id") + 10000000).alias("doc_id"), "text")
    u = docs.unionByName(copies)
    obs_mh = Observation("q83_cap")
    minhash_near_dup_pairs(
        u, threshold=0.9, num_hashes=64, bands=16, observation=obs_mh
    ).write.format("noop").mode("overwrite").save()
    assert obs_mh.get == {"dropped_rows": 0, "dropped_buckets": 0}

    obs_sh = Observation("q84_cap")
    simhash_near_dup_pairs(
        u, max_hamming=0, max_bucket=4000, observation=obs_sh
    ).write.format("noop").mode("overwrite").save()
    # dropped_* are structurally 0 since the r7 saturated-bucket
    # recovery; q84's oracle-equality PRECONDITION is now that the
    # recovery itself never engages (recovered == 0), because the
    # sorted-neighborhood tier emits chains, not cliques, and the
    # oracle is the full text-equality self-join.
    assert obs_sh.get == {
        "dropped_rows": 0,
        "dropped_buckets": 0,
        "recovered_rows": 0,
        "recovered_buckets": 0,
    }

    # q89: the oversized-cluster guard must not bind either (a dropped
    # cluster discards its planted pairs wholesale, same failure shape)
    from usajobs_etl_service_spark.operators.semdedup import semantic_dedup_drops

    obs_sd = Observation("q89_cap")
    semantic_dedup_drops(
        emb.unionByName(scaled), threshold=0.95, observation=obs_sd
    ).write.format("noop").mode("overwrite").save()
    assert obs_sd.get == {"dropped_rows": 0, "dropped_clusters": 0}
