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


def auto_n_clusters(n_rows: int, *, target_cluster: int = 200, floor: int = 16) -> int:
    """Cluster count that keeps EXPECTED cluster occupancy constant
    (~``target_cluster``) as the corpus grows — the same rule as
    neardup.srp_auto_planes, for the same reason: the within-cluster
    pair expansion is quadratic in cluster SIZE, so a fixed cluster
    COUNT turns super-linear the moment the corpus outgrows it
    (measured on the SRP family at the 10x smoke, r5). Constant
    occupancy makes total pair work ~linear: C * (n/C)^2 = n *
    target_cluster."""
    import math

    return max(floor, math.ceil(n_rows / max(target_cluster, 1)))


# above this codebook size the literal-argmax expression stops being a
# codegen win (q82's measured compile-cost territory: 128 x 64 dims =
# 8k literals) and assignment switches to pyspark.ml KMeans
LITERAL_CODEBOOK_MAX = 128


def assign_clusters(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    n_clusters: int | None = 64,
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
    1e-6 rounding boundary (~1e-10 per row, vs ~1e0 for the raw tie).

    ``n_clusters=None`` derives the count from the corpus
    (auto_n_clusters — constant expected occupancy, the scale-correct
    production setting). Codebooks above LITERAL_CODEBOOK_MAX switch
    from the literal-argmax expression to pyspark.ml KMeans over the
    normalized vectors (spherical k-means, the SemDeDup paper's own
    clustering): JVM-broadcast centers scale to thousands of clusters
    where an 8k+-literal expression would blow up codegen. The ml path
    trades the snap-tie determinism guarantee for scale — it is the
    production shape, not the oracle shape (oracle corpora stay under
    the literal threshold)."""
    if n_clusters is None:
        n_clusters = auto_n_clusters(df.count())
    if n_clusters > LITERAL_CODEBOOK_MAX:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        nv = l2_normalize(F.col(embedding_col).cast("array<double>"))
        feat = df.withColumn("__feat", array_to_vector(nv))
        # Codebook fits on a bounded deterministic sample (>= 50 rows
        # per centroid), assignment runs over everything — the standard
        # large-corpus k-means shape (a Lloyd pass over the full corpus
        # per iteration is iterations x assignment cost for marginal
        # centroid movement; measured 820 s for q89 at the 100x smoke
        # before sampling). Blocking quality only affects which
        # near-misses share a cluster; the exact-cosine verify keeps
        # precision regardless.
        fit_rows = max(50 * n_clusters, 50_000)
        fit_df = (
            feat.select("__feat", F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("__o"))
            .orderBy("__o")
            .limit(fit_rows)
            .select("__feat")
        )
        model = KMeans(
            k=n_clusters, seed=seed, maxIter=8, featuresCol="__feat", predictionCol="cluster_id"
        ).fit(fit_df)
        return model.transform(feat).select(
            F.col(id_col), F.col(embedding_col), F.col("cluster_id").cast("long")
        )
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
    # Stage the normalized vector through a REAL column before the
    # scoring lambda: an expression referenced inside a HOF lambda
    # re-evaluates per element, so an inlined l2_normalize (itself a
    # 64-element fold) recomputes once per centroid per row — measured
    # 18.6 s -> 0.7 s warm at sf0.1 for the assignment job. (Unrolling
    # the dots into C x dim literal products — the q82 plane trade —
    # was measured here at 4 s warm: one giant scalar expression falls
    # off the codegen fast path, while transform/zip_with/aggregate
    # over a staged primitive-array column stays on it.)
    nv = l2_normalize(F.col(embedding_col).cast("array<double>"))
    staged = df.withColumn("__nv", nv)
    # literal blocks cross py4j as ONE parsed SQL string — building
    # them lit-by-lit cost ~n_clusters x dim driver round trips (~2 s
    # of q89's warm time); the parsed values are identical doubles
    cents_lit = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{float(x)!r}D" for x in cv) + ")" for _, cv in cent_rows
        )
        + ")"
    )
    ids_lit = F.expr("array(" + ", ".join(f"{int(cid)}L" for cid, _ in cent_rows) + ")")
    scores = F.transform(cents_lit, lambda c: F.round(dot(F.col("__nv"), c), 6))
    pos = F.array_position(scores, F.array_max(scores)).cast("int")
    return staged.select(
        F.col(id_col), F.col(embedding_col), F.element_at(ids_lit, pos).alias("cluster_id")
    )


def semantic_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int | None = None,
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
    n_clusters: int | None = None,
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
