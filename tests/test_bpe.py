"""BPE merge learning (operators/bpe.py): pure-Python Sennrich replay,
leftmost-first fold semantics, early stop, determinism on real data."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from usajobs_etl_service_spark.operators.bpe import END, bpe_learn, merge_fold


def _py_bpe(texts, n_merges):
    """Reference Sennrich BPE on the word-frequency dict."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + [END])] += 1
    merges = []
    for r in range(1, n_merges + 1):
        pairs = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        # count desc, then lexicographic (a, b)
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, cnt))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def test_matches_python_reference_small(spark):
    texts = ["low lower lowest", "low low newer newest", "wider wide new"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    assert bpe_learn(df, n_merges=6) == _py_bpe(texts, 6)


def test_matches_python_reference_realdata(spark):
    from usajobs_etl_service_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    assert bpe_learn(docs.select("text"), n_merges=4) == _py_bpe(texts, 4)


def test_merge_fold_leftmost_first(spark):
    df = spark.createDataFrame([("l l l",), ("a l l b",), ("x y",)], ["s"])
    got = [r["m"] for r in df.select(merge_fold(F.col("s"), "l", "l").alias("m")).collect()]
    assert got == ["ll l", "a ll b", "x y"]


def test_merge_fold_multichar_symbols(spark):
    """After a merge creates 'll', merging (ll, o) must match the FULL
    symbol — never the 'l' tail of 'll'."""
    df = spark.createDataFrame([("he ll o",), ("he l lo",)], ["s"])
    got = [r["m"] for r in df.select(merge_fold(F.col("s"), "ll", "o").alias("m")).collect()]
    assert got == ["he llo", "he l lo"]


def test_early_stop_fully_fused(spark):
    """A corpus of one 1-char word fuses in one merge; later rounds
    find no pair and the loop stops."""
    df = spark.createDataFrame([("a a a",)], ["text"])
    merges = bpe_learn(df, n_merges=10)
    assert merges == [(1, "a", END, 3)]


def test_validation(spark):
    df = spark.createDataFrame([("x",)], ["text"])
    with pytest.raises(ValueError, match=">= 1"):
        bpe_learn(df, n_merges=0)


def test_return_vocab_segmentation(spark):
    texts = ["low lower low", "lowest low"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges, vocab = bpe_learn(df, n_merges=3, return_vocab=True)
    segs = {r["word"]: (r["freq"], r["syms"]) for r in vocab.collect()}
    assert set(segs) == {"low", "lower", "lowest"}
    assert segs["low"][0] == 3
    # replay the folds in Python over the learned merges
    for word, (_, syms) in segs.items():
        cur = list(word) + [END]
        for _, a, b, _ in merges:
            out, i = [], 0
            while i < len(cur):
                if i + 1 < len(cur) and cur[i] == a and cur[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(cur[i])
                    i += 1
            cur = out
        assert syms == " ".join(cur), word


def test_checkpoint_every_identical_results(spark):
    """The parquet lineage-reset path (checkpoint_every) must be
    invisible in the outputs: merges AND final vocab identical with a
    checkpoint firing every 2 rounds vs never (default 16 > n_merges)."""
    texts = ["low lower lowest low low", "new newer newest new", "low newer"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    m_plain, v_plain = bpe_learn(df, n_merges=5, return_vocab=True)
    m_ck, v_ck = bpe_learn(df, n_merges=5, return_vocab=True, checkpoint_every=2)
    assert m_plain == m_ck
    key = lambda rows: sorted((r["word"], r["freq"], r["syms"]) for r in rows)
    assert key(v_plain.collect()) == key(v_ck.collect())
    with pytest.raises(ValueError, match="checkpoint_every"):
        bpe_learn(df, n_merges=2, checkpoint_every=0)
