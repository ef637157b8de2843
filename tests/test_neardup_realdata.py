"""Near-dup recall on the real sf0.1 documents table, which contains
planted exact-duplicate groups: every md5-exact duplicate pair MUST be
recovered by MinHash LSH (est_jaccard = 1.0 pairs can't be missed —
identical signatures collide in every band)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.functions.text import fingerprint_md5
from usajobs_etl_service_spark.operators.neardup import minhash_near_dup_pairs
from usajobs_etl_service_spark.session import read_table

SF01 = "/root/testdata/sf0.1"


def test_minhash_recalls_all_exact_dups(spark):
    docs = read_table(spark, SF01, "documents")
    fp = docs.select("doc_id", fingerprint_md5(F.col("text")).alias("fp"))
    dup_pairs = {
        (r["a"], r["b"])
        for r in fp.alias("x")
        .join(fp.alias("y"), on="fp")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .collect()
    }
    if not dup_pairs:
        pytest.skip("no planted exact dups at this sf")
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(docs, threshold=0.9, num_hashes=64, bands=16).collect()
    }
    missed = dup_pairs - found
    assert not missed, f"minhash missed exact-dup pairs: {sorted(missed)[:5]}"
