"""Regenerate PLANS.md: formatted physical plans for the headline
queries, with the scale-relevant shape called out per plan.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from usajobs_etl_service_spark.session import get_spark

HEADLINERS = {
    "q01_job_statistics": "single-pass scalar multi-aggregate: partial+final HashAggregate, no row shuffle",
    "q04_top_k_recent": "TakeOrderedAndProject: per-partition k-heaps, no global sort",
    "q05_dedup_first_wins": "exactly one Exchange (hash partition on the dedup key)",
    "q08_like_prefix": "StringStartsWith pushed into the parquet scan; pruned ReadSchema",
    "q14_join_star": "dims broadcast: BroadcastHashJoin x2, zero shuffle of the fact side",
    "q16_upsert_merge": "merge batch broadcast: base table scanned once, no SortMergeJoin",
    "q18_topk_cosine": "vector math as JVM higher-order functions + TakeOrdered",
    "q38_pricing_summary": "pushed date filter + 2-key partial aggregation",
    "q39_top_unshipped": "filter-before-join, broadcast dim, TakeOrdered on grouped revenue",
    "q57_ivf_fullprobe": "IVF assignment as literal-array argmax projection: no join, the only Exchange is repartition(centroid_id)",
    "q62_tfidf_top_terms": "one (doc,term) data shuffle; document-frequency join left to AQE (open vocabulary must never carry a broadcast hint)",
    "q63_doc_chunks": "chunking entirely inside the scan stage: zero Exchange, zero UDF",
    "q65_sequence_packing": "shard-parallel window cumsum: one hash partition Exchange, no global sort",
    "q24_minhash_near_dup": "join-free LSH candidates: ONE signature aggregate (a banded self-join ran it twice under AQE), window-count hot-key guard, posexplode pair expansion bounded at O(bucket x sig) per row, verify-before-dedup so only passing id pairs shuffle — 3 Exchanges total",
    "q69_training_corpus_pipeline": "one lazy corpus plan: dedup -> curation_gate behind the shuffle-free nondeterministic barrier (no barrier Exchange; every Exchange in the plan is structural: dedup window, decontam grams, anti-join broadcast, final groupBy)",
    "q72_repetition_filter": "Gopher repetition rules as pure array expressions: zero Exchange (token mode = fold over sorted array, not explode+groupBy)",
    "q77_volume_shipping": "Q7 shape: dims broadcast, fact side shuffles once per join key, decimal-exact revenue sums",
    "q81_adaptive_quality_approx": "per-group threshold as ONE percentile_approx aggregate over a hash-sampled scan + null-safe broadcast LEFT join: no Window, no per-group sort anywhere",
    "q82_embedding_srp_near_dup": "label-free LSH: 96 plane dots in the scan stage, bucket-window hot-key cap, ids-only pair expansion, exact-cosine verify via two hash equi-joins — no cartesian/nested-loop join in the plan",
    "q91_bm25_retrieval": "doc length as F.size in the scan stage (no corpus shuffle); the only data Exchange is the queried-terms tf aggregate (isin filter map-side inside the explode); df + N/avgdl broadcast",
    "q93_fuzzy_edit_dedup": "blocked self-join is a hash equi-join on the 3-token block key; thresholded (banded) levenshtein per pair — no cartesian product, per-block cost bounded by block occupancy",
    "q95_pmi_collocations": "bigram extraction as arrays_zip against the array's own tail inside the scan (no posexplode self-join); two open-vocabulary aggregates; rank window only over the min_count-filtered survivors",
    "q28_global_sort_rank": "distributed_order rank: rangepartitioning Exchange + per-partition-id windows + broadcast carry-in — the no-partition WindowExec over data is gone (the surviving SinglePartition window runs over the 32-row per-partition-count aggregate)",
    "q117_concurrency_peak": "sweep line: per-day windowed running sum + broadcast carry-in offsets; no global window over the event stream",
    "q153_winnow_candidates": "row-wise winnowing: token posexplode -> lead()-window k-grams -> md5 -> frame-clipped window min, ZERO lambdafunctions in the executed plan (the round-7 O(n^2) CollapseProject inlining is structurally impossible); one id-keyed window Exchange feeds grams, counts and minima",
    "q157_prototypicality_prune": "single-pass argmax: scores array evaluated once through an aggregate fold over the persisted (id, nv, cluster) frame (InMemoryTableScan in-plan; no array_position double evaluation); cluster means re-shipped as a literal element_at lookup — the scoring pass has NO join",
    "q185_skew_safe_join": "skew-split join: the 80%-share hot key's rows take a BroadcastHashJoin branch (never shuffled on the key), cold keys the plain equi-join; union equals the unsplit join",
    "q186_zorder_prepared_float": "fixed-point on-ramp: floor(price/0.01) bigint bucket computed in the scan stage, then the q182 z-layout plan unchanged — floats never reach the interleave",
    "q187_int8_quantization_report": "int8 quantize + fidelity report entirely in the scan stage: ZERO Exchange, zero joins — per-vector scale fold, code transform and error folds are one codegen'd projection chain over multi-use aliases (never inlined per element)",
    "q189_int8_store_probe": "persisted-store probe: compact (id, qvec, scale) scan -> code-cosine TakeOrdered shortlist -> dequantized re-rank — no join, no shuffle; the float corpus is never re-read",
    "q190_skew_safe_semi_anti": "semi/anti skew split: hot branch is BroadcastHashJoin LeftSemi/LeftAnti against the distinct KEY SET of the hot right slice (skewed left rows never shuffle); cold branch plain; anti leg's hot keys arrive via a lazy broadcast key-frame",
    "q182_zorder_skipping": "Z-order layout: 1-row min/max broadcast + generated shift/mask interleave in the scan stage, exact global numbering via rangepartitioning + per-partition windows — no single-task WindowExec, no UDF",
    "q184_join_skew_report": "key-sized join diagnostics: per-side partial_count aggregates joined on the key (data rows never shuffle), TakeOrderedAndProject top-k",
    "q195_bucketed_join": "bucketed layout: two Bucketed: true FileScans -> SortMergeJoin -> same-key HashAggregate -> TakeOrdered, ZERO Exchange end-to-end — the fact shuffle was paid once at write time",
    "q196_quality_classifier": "classifier inference: BroadcastHashJoin of the <=width-row model onto the exploded feature stream; the only hash exchange is the per-document mean",
    "q202_bootstrap_ci": "bootstrap: md5 row seed once per row BEFORE the replicate explode; per-replicate integer mixer + inverse-CDF CASE over a PROJECTED uniform (inlining would double the hot path); (group, b) aggregate bounded by map-side combine",
    "q216_hilbert_layout": "Hilbert index: 8 chained codegen'd rotate-and-accumulate projections in the scan stage — no UDF, no shuffle before the bucket aggregate",
    "q221_classifier_auc": "exact rank-sum AUC, aggregate-first: the per-score HashAggregate collapses duplicate scores map-side BEFORE the wire; the rangepartitioning Exchange + per-partition-id windows (the distributed_order split) run over the DISTINCT support only, then one scalar fold — no row-level range repartition, no no-partition WindowExec over data",
    "q224_quantile_normalization": "quantile normalization: two materialized range Exchanges (within-group + pooled ranks), |groups|-row offset broadcast, integer-key equi join — no per-group sort, no interpolation",
    "q239_semantic_decontamination": "semantic decontamination: shared-codebook argmax assignment as a pure projection inside BOTH scans; the LITERAL __side tag folds the branch filter to false in the other union child, so each side scans ONLY its own source (2 scans total — without the tag the broadcast build re-scanned the corpus); within-cluster compare is a BroadcastHashJoin on cluster_id (benchmark broadcast) — the corpus never shuffles",
    "q241_containment_neardup": "containment near-dup: distinct (doc, gram-hash) explode -> gram-key equi self-join (pair expansion df-capped by the stop-gram rule) -> pair-count HashAggregate -> two size joins; every Exchange hashes on a gram or id key — no text ever crosses the wire twice",
    "q118_heavy_hitters": "Misra-Gries candidate pass in mapInPandas (no shuffle, O(k) state), candidate union broadcast into a LeftSemi BroadcastHashJoin — the exact-count aggregate shuffles only candidate-key rows, never the open token domain",
    "q122_revenue_gini": "rank-formula Gini over the distributed global rank: rangepartitioning + pid windows + scalar final aggregate",
    "q124_pareto_frontier": "skyline as per-price aggregate + strict distributed running min + one equi-join back: no quadratic dominance join anywhere",
    "q130_cdc_apply": "latest-wins window KEY-partitioned over the change stream only; base passes through a LeftAnti hash join; tombstones filtered before the union",
    "q139_rolling_active_users": "sliding COUNT DISTINCT as a bounded 7-way date explode + ONE distinct aggregate — no 7-day self-join",
    "q142_vocab_kl_divergence": "two token aggregates over one corpus scan; open-vocabulary join deliberately unbroadcast; scalar divergence reduce",
    "q98_pq_adc_exact_regime": "PQ encode as literal-codebook argmin projection (no join/shuffle); ADC probe = m element_at lookups + sum inside codegen, then TakeOrderedAndProject — no float vectors read at probe time",
    "q99_resample_gapfill": "dense bucket spine via sequence+explode (executor-side, no driver range); every window/join partitions on the entity key; forward fill as running last(ignorenulls)",
    "q103_returned_items": "fact filtered before the join; customer/nation broadcast; grouped revenue then TakeOrdered — no shuffle of unfiltered lineitem",
    "q105_textrank_terms": "3 fixed PageRank supersteps: per iteration one src-key join + one dst sum + left join preserving teleport mass; open node vocabulary (no broadcast hints)",
}

BLOOM_SECTION = """
## Parquet bloom-filter row-group pruning (P6/P7 point lookups)

Point lookups on hash-ordered keys (URIs, terms) get nothing from
min/max row-group stats — every group spans the full key range. A
parquet bloom filter on the key column lets the reader skip groups that
cannot contain the probe value.

Measured by `tools/bloom_pruning_demo.py` (2,000,000-row posting-style
table, `position_uri = md5(id)`, 256 KiB row groups, single equality
probe; "scan rows" = the parquet scan's `numOutputRows`, i.e. rows
surviving parquet-side pruning before Spark's Filter):

| Table | Row groups | Scan rows on point probe |
|---|---|---|
| no bloom filter | 497 | 2,000,000 (all groups read) |
| `parquet.bloom.filter.enabled#position_uri` | 497 | 4,031 (1 group read, 496 skipped) |

A ~500x reduction in rows read, i.e. the row-group analog of the
reference's b-tree index hit for `WHERE position_uri = ?`. Wired into
the write paths: the pipeline's job-table versions
(`pipeline._write_version`, bloom on `position_uri`) and the inverted
index (`textindex.write_posting_table`, bloom on `term`). Regression
tests: `tests/test_bloom_pruning.py`.
"""


def ivf_pruning_section(spark, sf_dir: str) -> str:
    """Build+persist the IVF index, probe it, and capture the scan's
    PartitionFilters line — the build-once/partition-pruned-probe proof."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from usajobs_etl_service_spark.operators.similarity import (
        ivf_build, ivf_load, ivf_topk_cosine, ivf_write,
    )
    from usajobs_etl_service_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    index, cents = ivf_build(emb.filter(F.col("vec_id") != 0), n_centroids=16)
    tmp = tempfile.mkdtemp(prefix="ivf_plans_", dir="spark-warehouse")
    try:
        ivf_write(index, cents, tmp)
        lindex, lcents = ivf_load(spark, tmp)
        probe = ivf_topk_cosine(lindex, lcents, qvec, k=10, nprobe=4)
        plan = probe._jdf.queryExecution().executedPlan().toString()
        scan_lines = [l.strip() for l in plan.splitlines() if "PartitionFilters" in l or "Batched" in l]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return "\n".join(
        [
            "## IVF build-once: persisted index probe prunes partitions",
            "",
            "The index is written `partitionBy(\"centroid_id\")`; a probe's",
            "`isin(probe_ids)` lands in the scan's **PartitionFilters**, so only",
            "the `nprobe` of `C` directories are planned — the rest of the index",
            "is never opened (16 centroids, nprobe=4 here; see",
            "`BENCH_DETAIL.json` `ivf_warm_probe_sec` for the warm-probe cost",
            "vs q36's build+probe):",
            "",
            "```",
            *scan_lines[:4],
            "```",
            "",
        ]
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain_plans")
    qs = entrymod.queries()
    out = [
        "# PLANS — physical plan evidence (generated by tools/explain_plans.py)",
        "",
        f"Formatted plans at `{sf_dir}`. Regenerate after planner-visible changes.",
        "",
    ]
    for name, claim in HEADLINERS.items():
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        # keep plans readable: strip codegen ids and trailing whitespace
        plan = re.sub(r"\n{3,}", "\n\n", plan).rstrip()
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Scale shape:** {claim}")
        out.append("")
        out.append("```")
        out.append(plan)
        out.append("```")
        out.append("")
    out.append(ivf_pruning_section(spark, sf_dir))
    out.append(BLOOM_SECTION.strip())
    out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(HEADLINERS)} plans")


if __name__ == "__main__":
    main()
