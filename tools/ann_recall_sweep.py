"""IVF recall/nprobe sweep: quantify the ANN trade-off on the real
embeddings table — recall@k vs fraction of the index scanned, per
nprobe, for sampled/k-means centroids.

Prints one JSON line; the committed artifact lives in ANN_SWEEP.json
(regenerate with: python tools/ann_recall_sweep.py [sf_dir]).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def sweep(spark, sf_dir: str, *, n_centroids: int = 16, k: int = 10, n_queries: int = 10, refine_kmeans: bool = False) -> dict:
    from usajobs_etl_service_spark.operators.similarity import ivf_build, ivf_topk_cosine, topk_cosine
    from usajobs_etl_service_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings").cache()
    total = emb.count()
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < n_queries).collect()
    ]
    index, cents = ivf_build(emb, n_centroids=n_centroids, refine_kmeans=refine_kmeans)
    index = index.cache()
    bucket_sizes = {r["centroid_id"]: r["n"] for r in index.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n")).collect()}

    out: dict[str, dict] = {}
    nprobes = [n for n in (1, 2, 4, 8, n_centroids) if n <= n_centroids]
    for nprobe in nprobes:
        recalls, scanned = [], []
        for qid, qvec in queries:
            rest = emb.filter(F.col("vec_id") != qid)
            exact = {r["vec_id"] for r in topk_cosine(rest, qvec, k=k).collect()}
            got_df = ivf_topk_cosine(index.filter(F.col("vec_id") != qid), cents, qvec, k=k, nprobe=nprobe)
            got = {r["vec_id"] for r in got_df.collect()}
            recalls.append(len(got & exact) / k)
            # fraction of index rows the probe had to scan
            from usajobs_etl_service_spark.functions.vectors import dot, l2_normalize
            probe_ids = [
                r["centroid_id"]
                for r in cents.select(
                    "centroid_id",
                    dot(F.col("cv"), l2_normalize(F.array(*[F.lit(x) for x in qvec]))).alias("s"),
                )
                .orderBy(F.col("s").desc())
                .limit(nprobe)
                .collect()
            ]
            scanned.append(sum(bucket_sizes.get(c, 0) for c in probe_ids) / total)
        out[str(nprobe)] = {
            "recall_at_k": round(sum(recalls) / len(recalls), 3),
            "frac_index_scanned": round(sum(scanned) / len(scanned), 3),
        }
    emb.unpersist()
    index.unpersist()
    return {
        "sf_dir": sf_dir,
        "n_centroids": n_centroids,
        "k": k,
        "n_queries": len(queries),
        "refine_kmeans": refine_kmeans,
        "by_nprobe": out,
    }


def main() -> None:
    from usajobs_etl_service_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-sweep")
    results = [sweep(spark, sf_dir, refine_kmeans=False), sweep(spark, sf_dir, refine_kmeans=True)]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
