"""Property-based chunking/packing: hypothesis-generated corpora and
(chunk, overlap, context) configs checked against pure-Python models."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from usajobs_etl_service_spark.operators.chunking import chunk_documents
from usajobs_etl_service_spark.operators.packing import pack_chunks

SET = settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])

DOC = st.lists(st.integers(min_value=0, max_value=99), min_size=0, max_size=60)  # token ids
CFG = st.tuples(st.integers(min_value=2, max_value=16), st.integers(min_value=0, max_value=15)).filter(
    lambda t: t[1] < t[0]
)


def _model_chunks(tokens: list[int], c: int, o: int) -> list[tuple[int, str, int]]:
    stride = c - o
    out = []
    # starts capped at len - o: no zero-new-token tail chunks
    for i, s in enumerate(range(0, max(len(tokens) - o, 1), stride) if tokens else []):
        window = tokens[s : s + c]
        out.append((i, " ".join(f"t{x}" for x in window), len(window)))
    return out


@given(st.lists(DOC, min_size=1, max_size=8), CFG)
@SET
def test_chunking_matches_model(spark, docs, cfg):
    c, o = cfg
    rows = [(i, " ".join(f"t{x}" for x in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=c, overlap_tokens=o).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        for cid, text, n in _model_chunks(toks, c, o):
            want[(i, cid)] = (text, n)
    assert got == want


@given(st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=30), st.integers(min_value=8, max_value=64))
@SET
def test_packing_matches_model(spark, token_counts, ctx):
    rows = [(1, i, "x", n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id int, chunk_text string, n_tokens int")
    got = {
        r["chunk_id"]: (r["start_offset"], r["bin_id"])
        for r in pack_chunks(df, context_tokens=ctx, n_shards=1).collect()
    }
    offset = 0
    for i, n in enumerate(token_counts):
        assert got[i] == (offset, offset // ctx)
        offset += n
