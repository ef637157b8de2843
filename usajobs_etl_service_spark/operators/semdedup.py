"""Semantic deduplication (SemDeDup-style) over an embedding column.

Public recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): cluster the corpus's
embeddings with k-means, compute pairwise cosine similarity only WITHIN
each cluster, and drop all but one representative of every group of
semantic duplicates (cosine >= threshold). Clustering turns the O(n^2)
all-pairs problem into C independent O((n/C)^2) problems — the same
blocking idea as LSH, but driven by the embedding geometry itself, so
it also catches paraphrase-level duplicates that share no n-grams.

Spark-first shape (everything JVM-side, no Python in the scan):
- Cluster assignment follows the IVF machinery
  (operators/similarity.ivf_build): centroids are inlined as a literal
  array and assignment is one codegen'd argmax projection inside the
  scan stage — no join, no shuffle, no n x C row blowup. Assignment
  scores the L2-normalized vector and snaps to 6 decimals before the
  argmax, so vectors with the same DIRECTION (cosine 1.0) provably
  land in the same cluster even against a codebook containing
  near-identical centroids (see assign_clusters) — the recall-1.0
  anchor the q89 oracle construction relies on.
- Within-cluster pairs come from a self-equi-join on ``cluster_id``
  (one hash shuffle per side, AQE-safe); exact cosine is computed on
  the joined rows (built-in higher-order functions), so precision
  needs no argument — the verify IS exact cosine.
- The per-cluster pair expansion is quadratic in cluster size, so the
  same hot-bucket discipline as the LSH family applies: clusters
  larger than ``max_cluster`` are dropped BEFORE the join, and the
  drop is never silent — ``observe`` counters record dropped rows and
  clusters (mirrors neardup._cap_buckets; at production scale you
  raise ``n_clusters`` instead of the cap, keeping expected occupancy
  ~n/C bounded).
- Drop policy is deterministic and SQL-expressible: a row is dropped
  iff some SMALLER id in its cluster is a semantic duplicate of it
  ("keep the minimum id of every duplicate group"). The paper keeps
  the member with the lowest centroid similarity; min-id is the same
  cardinality on exact-duplicate groups and makes the output an
  engine-independent set an oracle can recompute.

Reference parity note: the reference engine (etl/etl.py) has no
embedding surface at all — this operator is part of the §2.11
LLM-training-data family layered on top of its capabilities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from usajobs_etl_service_spark.functions.vectors import cosine, dot, l2_normalize


def _cluster_cap_metrics(max_cluster: int) -> tuple[Column, Column]:
    """observe() aggregates for the oversized-cluster guard: rows in
    dropped clusters + dropped cluster count (1/n weighting, exact for
    n < 2^52 — same trick as neardup._cap_drop_metrics)."""
    dropped = F.col("__csize") > max_cluster
    return (
        F.sum(dropped.cast("long")).alias("dropped_rows"),
        F.round(F.sum(F.when(dropped, 1.0 / F.col("__csize")).otherwise(0.0)))
        .cast("long")
        .alias("dropped_clusters"),
    )


def assign_clusters(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    n_clusters: int = 64,
    seed: int = 42,
    refine_kmeans: bool = False,
) -> DataFrame:
    """(id, embedding, cluster_id): nearest-centroid assignment as a
    pure projection (ivf_build's literal-argmax idea), with no
    repartition — the within-cluster self-join downstream shuffles on
    cluster_id anyway, and letting IT place the Exchange avoids
    shuffling the corpus twice.

    Unlike IVF probe assignment, dedup assignment must be IDENTICAL for
    equal-direction vectors even when the sampled codebook contains two
    near-identical centroids (a duplicate pair can itself be sampled —
    then a raw floating-point argmax faces a last-bit near-tie and can
    split the pair across clusters, which was measured, not
    hypothetical). So: score the L2-NORMALIZED vector (assignment
    becomes norm-invariant) and snap scores to 6 decimals before the
    argmax — equal-direction vectors then see EQUAL score arrays and
    ``array_position``'s first-max rule breaks the tie the same way for
    both. A real flip now needs two centroid cosines within ~1e-16 of a
    1e-6 rounding boundary (~1e-10 per row, vs ~1e0 for the raw tie)."""
    if refine_kmeans:
        from usajobs_etl_service_spark.operators.similarity import _kmeans_centroids

        cent = _kmeans_centroids(df, n_clusters, embedding_col, seed)
    else:
        # deterministic hash-ordered sample, as ivf_build
        cent = (
            df.select(
                F.col(id_col),
                l2_normalize(F.col(embedding_col).cast("array<double>")).alias("cv"),
            )
            .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
            .limit(n_clusters)
            .select(F.monotonically_increasing_id().alias("centroid_id"), "cv")
        )
    cent_rows = sorted(
        ((r["centroid_id"], [float(x) for x in r["cv"]]) for r in cent.collect()),
        key=lambda t: t[0],
    )
    nv = l2_normalize(F.col(embedding_col).cast("array<double>"))
    cents_lit = F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for _, cv in cent_rows])
    ids_lit = F.array(*[F.lit(int(cid)) for cid, _ in cent_rows])
    scores = F.transform(cents_lit, lambda c: F.round(dot(nv, c), 6))
    pos = F.array_position(scores, F.array_max(scores)).cast("int")
    return df.select(
        F.col(id_col), F.col(embedding_col), F.element_at(ids_lit, pos).alias("cluster_id")
    )


def semantic_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 64,
    seed: int = 42,
    refine_kmeans: bool = False,
    max_cluster: int = 10_000,
    round_digits: int = 4,
    observation=None,
) -> DataFrame:
    """(id_a, id_b, cos) with id_a < id_b, cosine >= threshold, both in
    the same k-means cluster. One shuffle on cluster_id per join side;
    exact-cosine verify on the pairs. Clusters above ``max_cluster``
    are dropped with observe() counters (see module docstring)."""
    assigned = assign_clusters(
        df,
        id_col=id_col,
        embedding_col=embedding_col,
        n_clusters=n_clusters,
        seed=seed,
        refine_kmeans=refine_kmeans,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    sized = assigned.withColumn("__csize", F.count(F.lit(1)).over(w))
    sized = sized.observe(
        observation if observation is not None else "semdedup_cluster_cap",
        *_cluster_cap_metrics(max_cluster),
    )
    # singleton clusters cannot form pairs; oversized ones are the guard
    members = sized.filter(F.col("__csize").between(2, max_cluster)).drop("__csize")

    a = members.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_a"),
        F.col(embedding_col).cast("array<double>").alias("va"),
    )
    b = members.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_b"),
        F.col(embedding_col).cast("array<double>").alias("vb"),
    )
    pairs = (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_digits).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(threshold))
    )
    return pairs


def semantic_dedup_drops(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 64,
    seed: int = 42,
    refine_kmeans: bool = False,
    max_cluster: int = 10_000,
    observation=None,
) -> DataFrame:
    """The SemDeDup decision set: rows to REMOVE, one per dropped id —
    ``(dropped_id, kept_id, max_cos)`` where ``kept_id`` is the
    smallest same-cluster semantic duplicate and ``max_cos`` the
    strongest duplicate similarity seen. Keep-min-id policy: an id is
    dropped iff ANY smaller id in its cluster clears the threshold.
    ``df.join(drops, on=dropped_id, how="left_anti")`` is the cleaned
    corpus."""
    pairs = semantic_dup_pairs(
        df,
        id_col=id_col,
        embedding_col=embedding_col,
        threshold=threshold,
        n_clusters=n_clusters,
        seed=seed,
        refine_kmeans=refine_kmeans,
        max_cluster=max_cluster,
        observation=observation,
    )
    return pairs.groupBy(F.col("id_b").alias("dropped_id")).agg(
        F.min("id_a").alias("kept_id"),
        F.max("cos").alias("max_cos"),
    )
