"""Distributed BPE merge learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — tokenizer
training as a Spark job, the stage that turns a curated corpus into
the subword vocabulary an LLM trains over.

Classic BPE trains on the WORD-FREQUENCY DICTIONARY, not the raw
corpus: after one corpus-wide word count, every round works on a
vocab-bounded (freq, symbols) table — the corpus is touched exactly
once regardless of how many merges are learned. Each round:

1. pair counts: explode each word's adjacent symbol pairs weighted by
   word frequency — one (a, b)-keyed aggregate over the vocab table;
2. the argmax pair (count desc, then lexicographic (a, b) — the
   deterministic tiebreak that makes training reproducible) comes to
   the driver as ONE row (the pq.py codebook posture: a bounded model
   artifact may ride the driver);
3. the merge applies as a left-to-right fold over each word's
   symbol string (``F.aggregate`` with a VARCHAR accumulator —
   leftmost-first non-overlapping, the reference BPE semantics:
   'l l l' under (l, l) becomes 'll l', never 'l ll'), guarded by a
   padded substring test so untouched words skip the fold;
4. the new (freq, symbols) table materializes via the
   parquet-superstep pattern (clustering.py's lineage argument —
   otherwise every round's fold nests inside the next round's plan).

Determinism end-to-end: integer counts, lexicographic tiebreaks, and
a pure-function fold — the learned merge table hash-matches a
round-unrolled DuckDB replay (q206) and a pure-Python reference
implementation (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from usajobs_etl_service_spark.functions.text import tokens_ws

__all__ = ["bpe_learn", "merge_fold"]

END = "</w>"


def merge_fold(syms: Column, a: str, b: str) -> Column:
    """Apply merge (a, b) -> ab to a space-delimited symbol string,
    leftmost-first non-overlapping (the canonical BPE application
    order). Pure expression — no UDF."""
    arr = F.split(syms, " ")
    return F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.get(arr, 0),
        lambda acc, x: F.when(
            ((acc == F.lit(a)) | acc.endswith(F.lit(" " + a))) & (x == F.lit(b)),
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.lit(len(a))),
                F.lit(a + b),
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


def bpe_learn(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 5,
    return_vocab: bool = False,
    checkpoint_every: int = 16,
):
    """Learn ``n_merges`` BPE merges over the whitespace-lowercased
    corpus. Returns ``[(round, pair_a, pair_b, pair_count), ...]`` —
    the merge table IS the trained tokenizer (apply in order with
    :func:`merge_fold` to tokenize new text). Stops early when no
    pair remains (every word fused to one symbol).

    ``return_vocab=True`` returns ``(merges, vocab)`` where ``vocab``
    is the final segmented dictionary ``(word, freq, syms)`` — the
    tokenize-APPLY artifact: a corpus tokenizes by joining its words
    against this table (subwords-per-word = the symbol count), never
    by re-running the folds per document.

    Round cost: the state table is VOCAB-bounded, so supersteps ride
    the cache, not parquet — each round is exactly ONE job (the argmax
    aggregate, which also materializes the previous round's fold as a
    side effect); the predecessor's cache is released as soon as its
    successor is materialized, and the final fold is never even
    computed unless ``return_vocab`` asks for it (the merge table
    alone can't observe it). Every ``checkpoint_every`` rounds the
    state additionally materializes to parquet and the cache chain
    resets — bounding plan nesting and recompute depth for real
    tokenizer runs (thousands of merges) while a 5-merge job never
    touches disk (round-11 VERDICT #5: the old per-round parquet
    round-trip serialized 5 extra write jobs)."""
    import atexit
    import os
    import shutil
    import tempfile

    from pyspark import StorageLevel

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    spark = df.sparkSession
    base: str | None = None  # tempdir materializes only if a checkpoint fires

    words = (
        df.select(F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.concat_ws(
                " ", F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
            ).alias("syms"),
        )
    )
    state = words.persist(StorageLevel.MEMORY_AND_DISK)
    prev: DataFrame | None = None

    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        arr = F.split(F.col("syms"), " ")
        n1 = F.greatest(F.size(arr) - 1, F.lit(0))
        pairs = (
            state.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(arr, 1, n1).alias("a"), F.slice(arr, 2, n1).alias("b")
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        # this action materialized `state`; its predecessor is now
        # recomputation-free and can release its cache
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((r, a, b, int(cnt)))
        if r == n_merges and not return_vocab:
            break  # the last fold is unobservable through the merge table
        # padded containment guard: only words holding the pair fold
        touched = F.instr(
            F.concat(F.lit(" "), F.col("syms"), F.lit(" ")), f" {a} {b} "
        ) > 0
        new_state = state.select(
            "word",
            "freq",
            F.when(touched, merge_fold(F.col("syms"), a, b))
            .otherwise(F.col("syms"))
            .alias("syms"),
        )
        if r % checkpoint_every == 0:
            # lineage/plan-depth reset for long merge runs: one parquet
            # materialization, then the cache chain restarts from a scan
            if base is None:
                base = tempfile.mkdtemp(prefix="bpe_rounds_")
                atexit.register(shutil.rmtree, base, ignore_errors=True)
            out_path = os.path.join(base, f"r{r}")
            new_state.write.mode("overwrite").parquet(out_path)
            state.unpersist()
            state = spark.read.parquet(out_path).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            prev = None
        else:
            prev, state = state, new_state.persist(StorageLevel.MEMORY_AND_DISK)
    if return_vocab:
        # materialize the final dictionary, then release its one cached
        # predecessor; the vocab frame itself stays cached for the
        # caller's tokenize join
        state.count()
        if prev is not None:
            prev.unpersist()
        return merges, state
    state.unpersist()
    if prev is not None:
        prev.unpersist()
    return merges
