"""PageRank over an edge table (Page/Brin 1998; fixed-iteration power
method), and its text-analysis application TextRank (Mihalcea & Tarau
2004): rank terms by centrality in the term co-occurrence graph —
keyword extraction without labels or models.

Second member of the iterative-algorithm family next to connected
components (operators/clustering.py). PageRank's superstep is cheaper
than CC's: each iteration is one edge-to-rank equi-join + one (dst)
sum aggregate + a left join back to the node list — all hash
partitions on node keys; nothing reaches the driver. With a FIXED
small iteration count the lineage stays bounded, so no superstep
materialization is needed; for long convergence runs at 100 TB, apply
clustering.py's parquet-superstep pattern every few rounds (same
argument: lineage truncation + executor-loss recovery).

Determinism: the damping constants are evaluated with the same IEEE
float expression shape the DuckDB oracle uses ((1 - d)/n, d * sum),
summation runs at double precision, and display rounding happens once
at the end — the q62 cross-engine float contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 3,
) -> DataFrame:
    """(node, pr) after ``n_iter`` power-method steps from the uniform
    start, dangling-free graphs only (every node must have >= 1
    out-edge — symmetrized co-occurrence graphs satisfy this by
    construction; assert upstream otherwise).

    pr_{i+1}(v) = (1 - d)/N + d * sum_{u -> v} pr_i(u) / outdeg(u)

    Scale shape per iteration: edges join the (node, pr) table on the
    src key and the degree table on the same key (open node vocabulary:
    no broadcast hints, AQE decides), one (dst) sum, one left join back
    to the node list so sink-only receivers keep their teleport mass.
    N is a broadcast scalar."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    nodes = e.select(F.col("s").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    deg = e.groupBy("s").agg(F.count(F.lit(1)).cast("double").alias("d"))
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(n_iter):
        contrib = (
            e.join(pr.withColumnRenamed("node", "s"), "s")
            .join(deg, "s")
            .groupBy("t")
            .agg(F.sum(F.col("pr") / F.col("d")).alias("c"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib.withColumnRenamed("t", "node"), "node", "left")
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr


def textrank_terms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_cooccur: int = 10,
    damping: float = 0.85,
    n_iter: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """TextRank keyword extraction: PageRank over the symmetrized
    adjacent-token co-occurrence graph (edges = distinct adjacent
    bigrams occurring >= min_cooccur times, both directions). Bigram
    extraction reuses the expression-only zip-against-tail shape
    (retrieval.pmi_collocations); ranking rounds before ordering for
    cross-engine ties."""
    from pyspark.sql import Window

    from usajobs_etl_service_spark.functions.text import tokens_ws

    toks = docs.select(tokens_ws(F.lower(F.col(text_col))).alias("ts"))
    bigrams = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))).alias("a"),
                    F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))).alias("b"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_cooccur)
    )
    edges = (
        bigrams.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(bigrams.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    pr = pagerank(edges, damping=damping, n_iter=n_iter)
    ranked = pr.select(F.col("node").alias("term"), F.round("pr", 6).alias("pr"))
    w = Window.orderBy(F.col("pr").desc(), F.col("term").asc())
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("rank", "term", "pr")
    )
