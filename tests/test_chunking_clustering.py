"""Chunking (fixed-token windows with overlap) and duplicate-cluster
resolution (connected components over near-dup pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.chunking import chunk_documents
from usajobs_etl_service_spark.operators.clustering import canonical_docs, connected_components


class TestChunking:
    def test_exact_cover_with_overlap(self, spark):
        text = " ".join(f"t{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = chunk_documents(df, chunk_tokens=4, overlap_tokens=1).orderBy("chunk_id").collect()
        # stride 3, n=10, starts capped at n - overlap = 9 -> starts 1,4,7
        # (a start at 10 would emit "t9" — fully contained in the chunk
        # at 7, zero new tokens)
        assert [r["chunk_id"] for r in rows] == [0, 1, 2]
        assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
        assert rows[1]["chunk_text"] == "t3 t4 t5 t6"
        assert rows[2]["chunk_text"] == "t6 t7 t8 t9"

    def test_short_and_empty_docs(self, spark):
        df = spark.createDataFrame([(1, "one two"), (2, "   "), (3, "")], "doc_id long, text string")
        rows = chunk_documents(df, chunk_tokens=128, overlap_tokens=16).collect()
        assert len(rows) == 1  # blank docs yield no chunks
        assert rows[0]["doc_id"] == 1 and rows[0]["chunk_text"] == "one two"

    def test_every_token_covered(self, spark, sf_dir):
        C, O, stride = 32, 8, 24
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        chunks = chunk_documents(docs, chunk_tokens=C, overlap_tokens=O)
        per_doc = {
            r["doc_id"]: (r["n_chunks"], r["sum_t"])
            for r in chunks.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"), F.sum("n_tokens").alias("sum_t"))
            .collect()
        }
        from usajobs_etl_service_spark.functions.text import token_count_ws

        truth = {
            r["doc_id"]: r["n"]
            for r in docs.select("doc_id", token_count_ws(F.col("text")).alias("n")).collect()
        }
        # exact model: starts 0, stride, ... <= n - O - 1; chunk i covers
        # min(C, n - start); every token covered, no zero-new-token tails
        for doc_id, n in truth.items():
            starts = list(range(0, max(n - O, 1), stride)) if n > 0 else []
            want = (len(starts), sum(min(C, n - s) for s in starts))
            got = per_doc.get(doc_id, (0, 0))
            assert got == want, f"doc {doc_id}: n={n} got {got} want {want}"

    def test_rejects_bad_overlap(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=8, overlap_tokens=8)


class TestConnectedComponents:
    def test_chain_and_isolated_pair(self, spark):
        # chain 1-2-3-4 plus pair 10-11: two components
        pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
        comp = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_long_chain_converges(self, spark):
        n = 12
        pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")
        comp = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
        assert set(comp.values()) == {0} and len(comp) == n + 1

    def test_deep_chain_logarithmic_rounds(self, spark):
        # a 300-hop chain on the FORCED distributed path: min-label
        # propagation needs a round per hop (300 >> the default iteration
        # cap); large-star/small-star must close it in O(log diameter)
        n = 300
        pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")
        labels, rounds = connected_components(pairs, return_rounds=True, small_graph_edges=0)
        comp = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
        assert set(comp.values()) == {0} and len(comp) == n + 1
        assert 1 <= rounds <= 12, f"expected O(log n) distributed rounds, took {rounds}"

    def test_driver_finish_matches_distributed(self, spark):
        # same random-ish graph through both paths -> identical labels
        edges = [(i, (i * 7) % 40) for i in range(40) if i != (i * 7) % 40] + [(100, 101)]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        fast = sorted(map(tuple, connected_components(pairs).collect()))
        dist = sorted(map(tuple, connected_components(pairs, small_graph_edges=0).collect()))
        assert fast == dist

    def test_two_components_with_shuffled_ids(self, spark):
        # non-contiguous ids, edges listed in arbitrary orientation
        edges = [(50, 7), (7, 93), (93, 2), (81, 40), (40, 81), (40, 99)]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        comp = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
        assert comp == {2: 2, 7: 2, 50: 2, 93: 2, 40: 40, 81: 40, 99: 40}

    def test_rounds_free_prior_checkpoints(self, spark):
        # each large-star/small-star round localCheckpoints its edge set;
        # the predecessor's blocks must be unpersisted as rounds advance,
        # not accumulate until session end (O(rounds) executor storage)
        n = 300
        pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")
        before = spark.sparkContext._jsc.getPersistentRDDs().size()
        labels, rounds = connected_components(pairs, return_rounds=True, small_graph_edges=0)
        labels.count()
        after = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert rounds >= 3, "need a multi-round run for this to be meaningful"
        # allowed to remain: the pinned node list + the final round's edges
        # (read by `labels`); everything round-intermediate must be gone
        assert after - before <= 2, (before, after, rounds)

    def test_canonical_docs_keeps_one_per_cluster(self, spark):
        docs = spark.createDataFrame([(i, f"text {i}") for i in range(6)], "doc_id long, text string")
        pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
        kept = sorted(r["doc_id"] for r in canonical_docs(pairs, docs).collect())
        assert kept == [0, 3, 4]  # cluster {0,1,2} -> 0; lone 3; cluster {4,5} -> 4
