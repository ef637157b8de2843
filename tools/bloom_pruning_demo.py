"""Row-group pruning evidence for parquet bloom filters (P6/P7 scale
path; VERDICT r1 item 7).

Setup: a posting-style table keyed by ``position_uri`` whose values are
hash-ordered (realistic for URIs) — min/max row-group stats are useless
for a point lookup because every row group spans the whole key range.
A parquet bloom filter on the key lets the reader skip row groups that
cannot contain the probe key.

Writes the identical table twice (with / without
``parquet.bloom.filter.enabled#position_uri``), small row groups so
there is something to skip, then runs the same equality probe and
reports the parquet scan's output rows (rows surviving parquet-side
row-group/page pruning, before Spark's own Filter). Prints one JSON
line; run directly or via tests/test_bloom_pruning.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def scan_output_rows(df) -> int:
    """numOutputRows of the leaf parquet scan after an action. The action
    must run the DataFrame's own QueryExecution (collect does; write
    builds a separate plan whose metrics we can't see)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def leaf_scan_metric(node):
        if node.children().isEmpty() and "Scan parquet" in node.nodeName():
            return node.metrics().get("numOutputRows").get().value()
        for i in range(node.children().size()):
            got = leaf_scan_metric(node.children().apply(i))
            if got is not None:
                return got
        return None

    # executedPlan may wrap scans in InputAdapter/WholeStageCodegen
    s = plan.toString()
    assert "Scan parquet" in s, s
    return leaf_scan_metric(plan) or _via_collect_leaves(plan)


def _via_collect_leaves(plan):
    leaves = plan.collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "Scan parquet" in node.nodeName():
            return node.metrics().get("numOutputRows").get().value()
    raise AssertionError("no parquet scan leaf found")


def total_row_groups(path: str) -> int:
    import pyarrow.parquet as pq

    n = 0
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            n += pq.ParquetFile(os.path.join(path, f)).metadata.num_row_groups
    return n


def run(spark: SparkSession, base_dir: str, n_rows: int = 2_000_000) -> dict:
    rows = spark.range(n_rows).select(
        F.concat(F.lit("https://jobs.example/"), F.md5(F.col("id").cast("string"))).alias("position_uri"),
        F.col("id").alias("doc_id"),
    )
    probe = "https://jobs.example/" + "c4ca4238a0b923820dcc509a6f75849b"  # md5("1")

    common = {
        # small row groups -> many pruning opportunities (default 128 MB
        # would give one group at this size)
        "parquet.block.size": str(256 * 1024),
    }
    plain, bloom = f"{base_dir}/plain", f"{base_dir}/bloom"
    w = rows.repartition(1).write.mode("overwrite")
    for k, v in common.items():
        w = w.option(k, v)
    w.parquet(plain)

    w = rows.repartition(1).write.mode("overwrite")
    for k, v in common.items():
        w = w.option(k, v)
    w = w.option("parquet.bloom.filter.enabled#position_uri", "true").option(
        "parquet.bloom.filter.expected.ndv#position_uri", str(n_rows)
    )
    w.parquet(bloom)

    out = {"n_rows": n_rows, "probe_matches": 1}
    for tag, path in (("plain", plain), ("bloom", bloom)):
        df = spark.read.parquet(path).filter(F.col("position_uri") == probe)
        out[f"{tag}_row_groups"] = total_row_groups(path)
        out[f"{tag}_scan_rows"] = scan_output_rows(df)
    out["scan_rows_ratio"] = round(out["plain_scan_rows"] / max(out["bloom_scan_rows"], 1), 1)
    return out


def main() -> None:
    from usajobs_etl_service_spark.session import get_spark

    spark = get_spark("bloom-demo")
    with tempfile.TemporaryDirectory(prefix="bloom_demo_") as d:
        print(json.dumps(run(spark, d)))


if __name__ == "__main__":
    main()
