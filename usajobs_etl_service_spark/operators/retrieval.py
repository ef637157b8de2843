"""Ranked full-text retrieval and corpus language statistics.

Extends the inverted-index surface (``operators/textindex.py``, the
engine-side analog of the reference's GIN index, reference
``init.sql:20``) from boolean matching to *ranked* retrieval (BM25) and
adds corpus-level language statistics a training-data pipeline needs:
unigram-LM surprisal scoring (the KenLM-style perplexity-proxy quality
gate used by CCNet/RefinedWeb-class curation), PMI collocation mining
(vocabulary induction / tokenizer-merge candidates), and a Zipf
rank-frequency fit (corpus health diagnostic).

Every operator here is pure DataFrame algebra — no UDFs, no collect —
and every aggregation is open-vocabulary-safe: term statistics shuffle on
``term`` with no broadcast hint (web-scale vocabularies are unbounded;
AQE still broadcasts when the dictionary actually fits), while scalar
normalizers (corpus size, average doc length, total token count) join
as single-row broadcasts.

At 100 TB: BM25's per-query work reads only the queried terms' posting
stats — with doc lengths and term frequencies precomputed as a stats
table (the `write_posting_table` layout plus a `doc_stats` side table),
a query touches a handful of term-hash buckets instead of the corpus.
The in-query computation below derives those stats on the fly so the
contract query is self-contained; the split into build-once/query-many
is the same seam as textindex.write_posting_table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from usajobs_etl_service_spark.functions.text import tokens_ws


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per token instance: (id, term), whitespace-lowercase
    tokenization (matches textindex/q62 and the DuckDB oracle)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score per document matching >= 1 query term.

    score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with the Lucene/ATIRE idf: ln(1 + (N - df + 0.5)/(df + 0.5)).

    Shuffle shape: doc length is an EXPRESSION (F.size of the token
    array — no doc_id aggregate, no shuffle; at scale it would come
    from a precomputed doc_stats table) and rides through the explode
    as a grouping constant, so the ONLY data shuffle is the
    (doc_id, term) aggregate over the queried terms — the isin filter
    runs inside the explode stage, map-side, so the shuffled posting
    slice is a few terms' worth, not the corpus. Per-term df counts
    (bounded: |query| rows) and the N/avgdl scalars join as
    broadcasts. Nothing here is proportional to vocabulary size.
    """
    norm_terms = sorted({t.strip().lower() for t in query_terms if t and t.strip()})
    if not norm_terms:
        raise ValueError("query_terms must contain at least one non-empty term")

    base = df.select(
        F.col(id_col).alias("doc_id"), tokens_ws(F.lower(F.col(text_col))).alias("ts")
    )
    # Scalar normalizers: corpus size and average doc length — one
    # expression-fed scalar aggregate over all docs (zero-token docs
    # included: BM25's N is the corpus size).
    scalars = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size("ts").cast("double")).alias("avgdl"),
    )
    # Term frequency for queried terms only (filter before the shuffle);
    # dl is constant per doc_id, so carrying it in the grouping key adds
    # no groups and saves the doc-length join entirely.
    tf = (
        base.select("doc_id", F.size("ts").alias("dl"), F.explode("ts").alias("term"))
        .filter(F.col("term").isin(norm_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # Document frequency per queried term: bounded by |query| rows.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            "term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("bm25"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )


def unigram_lm_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram-LM surprisal (mean nats/token): the
    perplexity-proxy quality score of CCNet-style curation — documents
    whose tokens are improbable under the corpus unigram distribution
    score high (gibberish, boilerplate-free rarity), repetitive
    common-token documents score low.

    surprisal(d) = (1/|d|) * sum_{t in d} -ln(C(t) / T)

    computed over per-(doc, term) tf rows (NOT per token instance): the
    term-count join is sized |distinct (doc, term)|, a fraction of the
    token stream. The unigram table joins on ``term`` with no broadcast
    hint (open vocabulary); T is a broadcast scalar."""
    toks = _tokens(df, id_col, text_col)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    unigrams = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = unigrams.agg(F.sum("ct").cast("double").alias("t_total"))
    return (
        tf.join(unigrams, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(-F.col("tf") * F.log(F.col("ct") / F.col("t_total"))) / F.sum("tf"),
                4,
            ).alias("surprisal_nats"),
            F.sum("tf").alias("n_tokens"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    unpersist_handle: list | None = None,
) -> DataFrame:
    """Per-document interpolated bigram-LM surprisal (mean nats/token)
    — the order-2 upgrade of :func:`unigram_lm_scores`'s CCNet-style
    quality proxy. A Jelinek-Mercer mixture scores each transition:

        P(w_i | w_{i-1}) = lam * C(w_{i-1} w_i) / C(w_{i-1})
                         + (1 - lam) * C(w_i) / T

    (the first token scores under the unigram term alone), and
    surprisal(d) = mean over d's tokens of -ln P. Repetitive documents
    — exactly the boilerplate a perplexity gate exists to catch — have
    predictable transitions and score LOW even when their unigram mix
    looks ordinary, which is the failure mode of the order-1 score.

    Shuffle shape: per-(doc, prev, cur) transition counts (NOT token
    instances) join the corpus bigram table on (prev, cur) and the
    unigram table on each side — three open-vocabulary equi-joins with
    no broadcast hint (AQE decides); T rides as a 1-row broadcast. At
    100 TB the bigram/unigram tables are the build-once artifacts (the
    posting-table seam); the per-doc pass touches only the document's
    own distinct transitions.

    Engine-reproducible: integer counts, one float expression per
    joined row, round-4 after the per-doc mean (the q92 contract)."""
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.filter(tokens_ws(F.lower(F.col(text_col))), lambda t: t != "").alias("ts"),
        )
        .filter(F.size("ts") >= 1)
        .select("doc_id", "ts", F.size("ts").alias("n_tokens"))
        # persisted (lazy marking, LRU-evictable — the triangle_stats
        # posture): base feeds FOUR consumers (transitions, unigrams,
        # the first-token leg, the n_tokens join); unpersisted, the
        # tokenize pass re-ran per reference (round 12, guide §1.2)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if unpersist_handle is not None:
        unpersist_handle.append(base)
    trans = (
        base.select(
            "doc_id",
            "n_tokens",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))).alias("p"),
                    F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))).alias("c"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.p").alias("prev"), F.col("bg.c").alias("cur"))
        .groupBy("doc_id", "prev", "cur")
        .agg(F.count(F.lit(1)).alias("tf_b"))
        # two consumers: the bigram table and the scoring join
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    unigrams = (
        base.select("doc_id", F.explode("ts").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cu"))
        # four consumers: total, both scoring joins, the first-token leg
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if unpersist_handle is not None:
        unpersist_handle.extend([trans, unigrams])
    bigrams = trans.groupBy("prev", "cur").agg(F.sum("tf_b").alias("cb"))
    total = unigrams.agg(F.sum("cu").cast("double").alias("t_total"))
    bigram_nats = (
        trans.join(bigrams, ["prev", "cur"])
        .join(unigrams.select(F.col("term").alias("prev"), F.col("cu").alias("cu_prev")), "prev")
        .join(unigrams.select(F.col("term").alias("cur"), F.col("cu").alias("cu_cur")), "cur")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (
                -F.col("tf_b")
                * F.log(
                    F.lit(lam) * F.col("cb") / F.col("cu_prev")
                    + F.lit(1.0 - lam) * F.col("cu_cur") / F.col("t_total")
                )
            ).alias("nats"),
        )
    )
    first_nats = (
        base.select("doc_id", F.element_at("ts", 1).alias("term"))
        .join(unigrams, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", (-F.log(F.col("cu") / F.col("t_total"))).alias("nats"))
    )
    return (
        bigram_nats.unionByName(first_nats)
        .groupBy("doc_id")
        .agg(F.sum("nats").alias("sum_nats"))
        .join(base.select("doc_id", "n_tokens"), "doc_id")
        .select(
            "doc_id",
            F.round(F.col("sum_nats") / F.col("n_tokens"), 4).alias("surprisal_nats"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 20,
    top_k: int = 50,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information — the statistic behind tokenizer merge-candidate
    selection and phrase mining.

    pmi(a, b) = ln( (C(ab)/B) / ((C(a)/U) * (C(b)/U)) )

    Bigram extraction is expression-only (zip the token array against
    its own tail — no posexplode self-join); bigram and unigram counts
    are each ONE open-vocabulary aggregate; the final ranking sorts the
    ``min_count``-filtered bigram set (bounded: frequent bigrams only)
    with a rounded-score + lexical tiebreak so cross-engine float ties
    rank identically."""
    toks = df.select(tokens_ws(F.lower(F.col(text_col))).alias("ts"))
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
    )
    unigrams = _tokens(df, id_col, text_col).groupBy("term").agg(F.count(F.lit(1)).alias("c_t"))
    b_total = bigrams.agg(F.sum("c_ab").cast("double").alias("n_bi"))
    u_total = unigrams.agg(F.sum("c_t").cast("double").alias("n_uni"))
    scored = (
        bigrams.filter(F.col("c_ab") >= min_count)
        .join(unigrams.withColumnRenamed("term", "a").withColumnRenamed("c_t", "c_a"), "a")
        .join(unigrams.withColumnRenamed("term", "b").withColumnRenamed("c_t", "c_b"), "b")
        .crossJoin(F.broadcast(b_total))
        .crossJoin(F.broadcast(u_total))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("n_bi"))
                    / ((F.col("c_a") / F.col("n_uni")) * (F.col("c_b") / F.col("n_uni")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pmi").desc(), F.col("a").asc(), F.col("b").asc())
    # Global window over the min_count-filtered set only — bounded by
    # construction (a term can't appear in more frequent bigrams than
    # tokens), and top_k keeps the result tiny.
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("rank", "a", "b", "c_ab", "pmi")
    )


def zipf_fit(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Least-squares fit of ln(freq) ~ ln(rank) over the term
    rank-frequency distribution (terms with count >= min_count). A
    healthy natural-language corpus has slope near -1 (Zipf's law);
    template-heavy or synthetic corpora deviate — a one-row corpus
    diagnostic.

    One open-vocabulary term aggregate, one global rank window over the
    min_count-filtered vocabulary (bounded: corpus_tokens/min_count
    rows), then a scalar regr_slope/regr_intercept aggregate."""
    from pyspark.sql import Window

    counts = (
        _tokens(df, id_col, text_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
    )
    w = Window.orderBy(F.col("c").desc(), F.col("term").asc())
    ranked = counts.withColumn("rank", F.row_number().over(w))
    lx = F.log(F.col("rank").cast("double"))
    ly = F.log(F.col("c").cast("double"))
    return ranked.agg(
        F.round(F.regr_slope(ly, lx), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ly, lx), 6).alias("zipf_intercept"),
        F.count(F.lit(1)).alias("n_terms"),
    )


def kneser_ney_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    unpersist_handle: list | None = None,
) -> DataFrame:
    """Per-document surprisal under an interpolated Kneser-Ney bigram
    LM (Kneser & Ney 1995; the Chen & Goodman 1998 interpolated form
    with a single absolute discount D) trained on the corpus itself —
    the smoothing family production perplexity gates (KenLM/CCNet)
    actually use, where :func:`bigram_lm_scores`'s Jelinek-Mercer
    mixture backs off to raw unigram frequency, KN backs off to
    CONTINUATION probability (in how many distinct contexts does this
    word appear?), which is what demotes high-frequency-but-bound
    tokens (the "Francisco" problem).

        P(w | p) = (C(p,w) - D) / C(p)
                 + (D * N1+(p, *) / C(p)) * (N1+(*, w) / B)

    with C(p) = sum_w C(p, w), N1+(p, *) = |{w : C(p,w) > 0}|,
    N1+(*, w) = |{p : C(p,w) > 0}|, and B = |distinct bigrams|.
    Train == eval corpus, so every scored bigram has C(p,w) >= 1 > D
    and the max(.-D, 0) clamp never binds. surprisal(d) = mean nats
    over d's transitions (docs with >= 2 tokens).

    Shuffle shape (all open-vocabulary aggregates, no broadcast
    hints — AQE decides): per-(doc, prev, cur) transition counts, the
    corpus bigram table grouped from them, context totals/fan-out by
    ``prev``, continuation fan-in by ``cur``, then three equi-joins
    back onto the transition rows; B rides as a 1-row broadcast. At
    100 TB the bigram/context/continuation tables are build-once
    artifacts (the posting-table seam). Engine-reproducible: every
    model statistic is an exact integer count, each joined row applies
    ONE float expression, and the per-doc mean rounds to 4 (the
    q92/q156 contract)."""
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.filter(tokens_ws(F.lower(F.col(text_col))), lambda t: t != "").alias("ts"),
        )
        .filter(F.size("ts") >= 2)
        .select("doc_id", "ts", (F.size("ts") - 1).alias("n_transitions"))
    )
    trans = (
        base.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ts"), 1, F.size("ts") - 1).alias("p"),
                    F.slice(F.col("ts"), 2, F.size("ts") - 1).alias("c"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.p").alias("prev"), F.col("bg.c").alias("cur"))
        .groupBy("doc_id", "prev", "cur")
        .agg(F.count(F.lit(1)).alias("tf_b"))
        # persisted (lazy marking, LRU-evictable — the triangle_stats
        # posture): trans feeds the bigram table AND the scoring join;
        # unpersisted, the tokenize + explode + per-doc aggregate re-ran
        # per reference (optimization round 12, guide §1.2)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bigrams = (
        trans.groupBy("prev", "cur")
        .agg(F.sum("tf_b").alias("cb"))
        # four consumers: ctx, cont, b_total, and the scoring join
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if unpersist_handle is not None:
        unpersist_handle.extend([trans, bigrams])
    ctx = bigrams.groupBy("prev").agg(
        F.sum("cb").alias("c_ctx"), F.count(F.lit(1)).alias("n_follow")
    )
    cont = bigrams.groupBy("cur").agg(F.count(F.lit(1)).alias("n_prec"))
    b_total = bigrams.agg(F.count(F.lit(1)).cast("double").alias("b_total"))
    d = F.lit(discount)
    prob = (
        F.greatest(F.col("cb") - d, F.lit(0.0)) / F.col("c_ctx")
        + (d * F.col("n_follow") / F.col("c_ctx")) * (F.col("n_prec") / F.col("b_total"))
    )
    return (
        trans.join(bigrams, ["prev", "cur"])
        .join(ctx, "prev")
        .join(cont, "cur")
        .crossJoin(F.broadcast(b_total))
        .select("doc_id", (-F.col("tf_b") * F.log(prob)).alias("nats"), "tf_b")
        .groupBy("doc_id")
        # n_transitions == sum(tf_b) over the doc's scored transition
        # rows (inner joins on model tables keep every trans row), so
        # the join back onto `base` — a second tokenize pass — is free
        .agg(
            F.sum("nats").alias("sum_nats"),
            F.sum("tf_b").alias("n_transitions"),
        )
        .select(
            "doc_id",
            F.round(F.col("sum_nats") / F.col("n_transitions"), 4).alias("kn_surprisal_nats"),
            F.col("n_transitions").cast("long").alias("n_transitions"),
        )
    )


def rrf_fuse(
    legs: list[tuple[str, DataFrame]],
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    rrf_k: int = 60,
    top_n: int = 100,
    top_k: int = 50,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    N ranked retrieval legs — the standard hybrid-search combiner for
    sparse (BM25) + dense (embedding cosine) legs, used because it
    needs NO score calibration: only ranks enter the fused score

        rrf(d) = sum over legs of 1 / (rrf_k + rank_leg(d)).

    Each leg is (name, DataFrame[id_col, score_col]); ranks are
    F.rank() over (score desc, id asc) — ties share a rank, which is
    engine-independent when the leg scores are pre-rounded (the
    callers round: BM25 to 6, cosine to 4), where row_number would tie
    -break on engine-internal order. Docs absent from a leg's top
    ``top_n`` contribute nothing for that leg (the standard RRF
    convention).

    Scale posture: each leg is FIRST cut to its top ``top_n`` by a
    TakeOrderedAndProject (never a global sort), and the rank window
    runs on that bounded shortlist — a single-partition window over
    <= top_n rows, which is exactly when a single-partition window is
    legitimate. Because the cut keeps a prefix of the same total
    order the window ranks by, shortlist ranks equal corpus ranks.
    The fuse itself is one groupBy over <= N*top_n rows. At 100 TB
    the legs' own top-n machinery (posting tables, ANN indexes) bound
    the work; the fusion never touches the corpus. The <= N-term
    float sum is order-insensitive for the contract's two legs
    (2-operand FP addition commutes) and rounds to 6."""
    from pyspark.sql import Window

    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    ranked = []
    for name, leg in legs:
        short = (
            leg.select(F.col(id_col).alias("id"), F.col(score_col).alias("s"))
            .orderBy(F.col("s").desc(), F.col("id").asc())
            .limit(top_n)
        )
        # rank over the SCORE ALONE (the id may not appear in the window
        # order: rank() defines ties by the full ORDER BY list, so an id
        # tiebreak would degenerate rank into row_number); every row with
        # a strictly greater score precedes any tie-group member in the
        # shortlist's cut order, so shortlist ranks equal corpus ranks.
        w = Window.orderBy(F.col("s").desc())
        ranked.append(
            short.select("id", F.rank().over(w).alias("r"), F.lit(name).alias("leg"))
        )
    allranks = ranked[0]
    for r in ranked[1:]:
        allranks = allranks.unionByName(r)
    aggs = [
        F.round(F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("r"))), 6).alias("rrf"),
    ] + [
        F.max(F.when(F.col("leg") == name, F.col("r"))).alias(f"rank_{name}")
        for name, _ in legs
    ]
    return (
        allranks.groupBy(F.col("id").alias(id_col))
        .agg(*aggs)
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def ranking_agreement(
    leg_a: DataFrame,
    leg_b: DataFrame,
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    top_n: int = 20,
) -> DataFrame:
    """Agreement diagnostics between two retrieval rankings (the
    sparse-vs-dense sanity report a hybrid-search rollout reads before
    trusting RRF): one row with overlap@n, Jaccard@n, MRR of leg A's
    list under leg B's ranks, and Kendall tau-a over the intersection.

    Determinism: ranks come from :func:`rrf_fuse`'s contract (rank()
    over pre-rounded scores, prefix-stable top-n cut), so every metric
    except MRR is INTEGER-EXACT until one final division — Kendall's
    concordant/discordant counts are integer sign tests, overlap and
    the Jaccard numerator/denominator are counts. MRR sums <= top_n
    reciprocals of integers and rounds to 6 (the q105 float posture).
    Everything downstream of the two top-n cuts is bounded by top_n
    rows (the pair expansion by top_n^2), so at 100 TB the corpus cost
    is the legs' own — the diagnostics are driver-free tail work."""
    from pyspark.sql import Window

    def ranked(leg: DataFrame, rcol: str) -> DataFrame:
        short = (
            leg.select(F.col(id_col).alias("id"), F.col(score_col).alias("s"))
            .orderBy(F.col("s").desc(), F.col("id").asc())
            .limit(top_n)
        )
        w = Window.orderBy(F.col("s").desc())
        return short.select("id", F.rank().over(w).alias(rcol))

    ra = ranked(leg_a, "ra")
    rb = ranked(leg_b, "rb")
    inter = ra.join(rb, "id")
    # Kendall tau-a over the intersection: bounded m^2 pair expansion
    p1 = inter.select(F.col("id").alias("i"), F.col("ra").alias("ra1"), F.col("rb").alias("rb1"))
    p2 = inter.select(F.col("id").alias("j"), F.col("ra").alias("ra2"), F.col("rb").alias("rb2"))
    pairs = p1.join(p2, F.col("i") < F.col("j"))
    sign = (F.col("ra1") - F.col("ra2")) * (F.col("rb1") - F.col("rb2"))
    kendall = pairs.agg(
        F.sum(F.when(sign > 0, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when(sign < 0, 1).otherwise(0)).alias("discordant"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    # denominator is leg A's MEASURED shortlist size, not top_n: a
    # sparse leg that returns fewer than top_n rows must not silently
    # deflate the mean (an absent candidate is not a rank-infinity hit)
    mrr = (
        ra.join(rb, "id", "left")
        .agg(
            F.sum(F.coalesce(F.lit(1.0) / F.col("rb"), F.lit(0.0))).alias("mrr_sum")
        )
    )
    counts = inter.agg(F.count(F.lit(1)).alias("overlap"))
    na = ra.agg(F.count(F.lit(1)).alias("n_a"))
    nb = rb.agg(F.count(F.lit(1)).alias("n_b"))
    return (
        counts.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(mrr))
        .crossJoin(F.broadcast(kendall))
        .select(
            "overlap",
            F.round(
                F.col("overlap") / (F.col("n_a") + F.col("n_b") - F.col("overlap")), 6
            ).alias("jaccard"),
            F.round(F.col("mrr_sum") / F.col("n_a"), 6).alias("mrr_a_in_b"),
            F.when(F.col("n_pairs") > 0, F.round(
                (F.col("concordant") - F.col("discordant")) / F.col("n_pairs"), 6
            )).alias("kendall_tau"),
            "concordant",
            "discordant",
            "n_pairs",
        )
    )


def llr_collocations(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Dunning log-likelihood-ratio collocations (Dunning 1993) — the
    significance-tested upgrade of :func:`pmi_collocations` (PMI
    over-ranks rare pairs; G2 weighs evidence mass): for each adjacent
    bigram, G2 = 2 * sum over the 2x2 contingency table of
    k_ij * ln(k_ij * N / (R_i * C_j)), zero cells contributing zero.

    Every contingency cell is an exact integer (bigram count, marginal
    prefix/suffix counts, total); G2 is ONE fixed-shape float
    expression per surviving bigram row, rounded to 6 before the
    total-ordered (g2 desc, a, b) top-k — the q95/q171 cross-engine
    contract. Shuffles: one (a, b) bigram aggregate, two marginal
    aggregates joined back on open-vocabulary keys (no broadcast
    hints), N as a 1-row broadcast."""
    base = df.select(
        F.filter(tokens_ws(F.lower(F.col(text_col))), lambda t: t != "").alias("ts")
    )
    bigrams = (
        base.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))).alias("a"),
                    F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))).alias("b"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("k11x"))
    )
    left = bigrams.groupBy("a").agg(F.sum("k11x").alias("ca"))
    right = bigrams.groupBy("b").agg(F.sum("k11x").alias("cb"))
    total = bigrams.agg(F.sum("k11x").cast("double").alias("n"))

    def term(k, r, c):
        return F.when(k > 0, k * F.log(k * F.col("n") / (r * c))).otherwise(F.lit(0.0))

    k11 = F.col("k11x")
    k12 = F.col("ca") - k11
    k21 = F.col("cb") - k11
    k22 = F.col("n") - F.col("ca") - F.col("cb") + k11
    r1, r2 = F.col("ca"), F.col("n") - F.col("ca")
    c1, c2 = F.col("cb"), F.col("n") - F.col("cb")
    g2 = F.lit(2.0) * (
        term(k11, r1, c1) + term(k12, r1, c2) + term(k21, r2, c1) + term(k22, r2, c2)
    )
    return (
        bigrams.filter(F.col("k11x") >= min_count)
        .join(left, "a")
        .join(right, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            F.col("k11x").alias("pair_count"),
            F.round(g2, 6).alias("g2"),
        )
        .orderBy(F.col("g2").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(top_k)
    )
