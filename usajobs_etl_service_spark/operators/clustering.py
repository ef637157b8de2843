"""Duplicate-cluster resolution: connected components over near-dup
pairs, so "A~B, B~C" collapses to one cluster and a dedup pipeline can
keep exactly one canonical doc per cluster.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round every node takes the min of its own label
and its neighbors' labels; converged when no label changes. Rounds
needed = the largest component's diameter — near-dup clusters are
shallow (stars/cliques around a template), so a handful of rounds
closes them. Each round is one equi-join + one aggregate (shuffle on
node id); nothing is ever collected to the driver except the O(1)
convergence counter. At larger diameters swap in the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce") — same join/agg primitives, fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve undirected edges into components: returns ``(doc_id,
    cluster_id)`` with ``cluster_id`` = the component's minimum doc_id.
    Every node appearing in any pair is returned (including both ends
    of each edge). Raises if not converged in ``max_iterations``."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # materialize once: the pair generation upstream (LSH banding /
        # blocked cosine joins) is the expensive part and every round
        # joins against it — never re-derive it per iteration
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("dst", "id")
        )
        # checkpoint BEFORE the convergence count so each round evaluates
        # the join exactly once (and lineage stays one round deep)
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # one scalar to the driver per round: number of changed labels
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")


def canonical_docs(pairs: DataFrame, docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Dedup by cluster: keep each component's minimum-id doc plus every
    doc in no component — the keep-one-per-duplicate-group step."""
    comp = connected_components(pairs)
    drop = comp.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(drop, docs[id_col] == drop["doc_id"], "left_anti")
