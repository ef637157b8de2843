"""MinHash-LSH recall sweep: quantify the (bands, rows_per_band)
trade-off on planted near-duplicates over the REAL documents table —
the measured counterpart of the multi-resolution banding knob
(`extra_band_configs`), like ANN_SWEEP.json is for IVF nprobe.

Method: perturbed copies of real docs are planted at several mutation
rates so their true 5-gram Jaccard spans the threshold; each config's
recall is the fraction of planted pairs with true J >= the given floor
that the LSH candidate+verify pipeline returns. `candidate_pairs` is
the pre-verification candidate volume at threshold=0 — the cost the
exact-similarity stage pays (the LSH theory: more/narrower bands =
higher recall AND more candidates).

Prints one JSON line; the committed artifact lives in
MINHASH_SWEEP.json (regenerate: python tools/minhash_recall_sweep.py
[sf_dir]).
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_corpus(spark, sf_dir: str, *, n_planted: int = 250, seed: int = 7):
    """Real docs + perturbed copies (ids offset by 10^7). Returns
    (corpus_df, planted_pairs: list[(orig_id, copy_id)])."""
    from usajobs_etl_service_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.orderBy("doc_id").limit(n_planted).collect()
    rng = random.Random(seed)
    rates = [0.02, 0.05, 0.10, 0.20, 0.35]
    copies, planted = [], []
    for i, r in enumerate(base):
        toks = r["text"].split()
        if len(toks) < 10:
            continue
        rate = rates[i % len(rates)]
        k = max(1, int(len(toks) * rate))
        for pos in rng.sample(range(len(toks)), k):
            toks[pos] = f"mut{pos}x"
        cid = r["doc_id"] + 10_000_000
        copies.append((cid, " ".join(toks)))
        planted.append((r["doc_id"], cid))
    corpus = docs.unionByName(spark.createDataFrame(copies, "doc_id long, text string"))
    return corpus, planted


def true_jaccard(spark, corpus, planted, shingle_k: int = 5) -> dict[tuple[int, int], float]:
    from usajobs_etl_service_spark.operators.neardup import ngram_jaccard_pairs

    pairs_df = spark.createDataFrame(planted, "id_a long, id_b long")
    out = ngram_jaccard_pairs(corpus, pairs_df, n=shingle_k)
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}


def sweep(spark, sf_dir: str, *, threshold: float = 0.5, num_hashes: int = 64) -> list[dict]:
    from usajobs_etl_service_spark.operators.neardup import minhash_near_dup_pairs

    corpus, planted = build_corpus(spark, sf_dir)
    corpus = corpus.cache()
    tj = true_jaccard(spark, corpus, planted)
    configs: list[tuple[int, list[tuple[int, int]] | None]] = [
        (8, None),
        (16, None),
        (32, None),
        (16, [(32, 2)]),  # multi-resolution: base (16,4) + looser (32,2)
    ]
    results = []
    for bands, extra in configs:
        found = {
            (r["id_a"], r["id_b"])
            for r in minhash_near_dup_pairs(
                corpus, threshold=threshold, num_hashes=num_hashes, bands=bands,
                extra_band_configs=extra,
            ).collect()
        }
        n_cand = minhash_near_dup_pairs(
            corpus, threshold=0.0, num_hashes=num_hashes, bands=bands,
            extra_band_configs=extra,
        ).count()
        row = {
            "bands": bands,
            "rows_per_band": num_hashes // bands,
            "extra_band_configs": extra,
            "candidate_pairs": n_cand,
        }
        for floor in (threshold, threshold + 0.1, threshold + 0.2):
            eligible = [p for p, j in tj.items() if j is not None and j >= floor]
            hit = sum(1 for p in eligible if p in found)
            row[f"recall_at_true_j>={floor:.1f}"] = round(hit / len(eligible), 3) if eligible else None
            row[f"n_eligible_j>={floor:.1f}"] = len(eligible)
        results.append(row)
    return results


def main() -> None:
    from usajobs_etl_service_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("minhash_sweep")
    out = {"sf_dir": sf_dir, "threshold": 0.5, "num_hashes": 64, "shingle_k": 5, "configs": sweep(spark, sf_dir)}
    print(json.dumps(out), flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "MINHASH_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
