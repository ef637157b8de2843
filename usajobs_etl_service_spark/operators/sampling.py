"""Deterministic (hash-based) sampling for corpus mixing.

Training-data pipelines weight sources ("2 epochs of wiki, 0.3 of
web"): that requires sampling that is *reproducible* across runs,
executors, and engines — ``df.sample()`` is seeded per-partition and
changes under repartitioning. Here the keep/drop decision is a pure
function of the row's key: uniform in [0,1) from the first 8 hex chars
of md5(key#seed). Runs inside the scan (codegen, no shuffle), pushes
nothing to the driver, and any engine with md5 reproduces it exactly
(the DuckDB oracle does).

md5 here is a uniformity device, not security-relevant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = float(2**32)


def sample_key(col: Column, *, seed: int = 42) -> Column:
    """Deterministic uniform [0,1) from a key column + seed."""
    h = F.conv(F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"#{seed}"))), 1, 8), 16, 10)
    return h.cast("long") / F.lit(_BUCKETS)


def hash_sample(df: DataFrame, rate: float, *, key_col: str, seed: int = 42) -> DataFrame:
    """Keep ~``rate`` of rows, decided per key — same key, same verdict,
    every run and engine."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(sample_key(F.col(key_col), seed=seed) < rate)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    *,
    key_col: str,
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (source-mixing weights). Strata not in
    ``rates`` get ``default_rate``."""
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    rate_col: Column = F.lit(float(default_rate))
    for k, r in sorted(rates.items()):
        rate_col = F.when(F.col(strata_col) == k, float(r)).otherwise(rate_col)
    return df.filter(sample_key(F.col(key_col), seed=seed) < rate_col)


def adaptive_quality_gate(
    df: DataFrame,
    *,
    group_col: str,
    score_col: str,
    keep_frac: float = 0.75,
    approx: bool = False,
    approx_accuracy: int = 10000,
    threshold_sample: float | None = None,
    sample_key_col: str | None = None,
) -> DataFrame:
    """Keep each group's top ``keep_frac`` of rows by ``score_col`` —
    the adaptive curation rule ("top 75% quality per source") that a
    fixed global threshold can't express when sources differ in
    baseline quality.

    Exact mode (default, the oracle semantics): keep rows whose
    ``cume_dist()`` within the group is >= 1 - keep_frac. SQL-standard
    tie handling, so any engine agrees row-for-row — but the window
    sorts each group in one task, which a dominant source would melt.

    ``approx=True`` is the 100 TB shape: one aggregate pass computes
    each group's (1 - keep_frac) quantile with ``percentile_approx``
    (GK sketch, mergeable partials), then a per-group threshold join
    (AQE broadcasts the small side) filters at scan speed. No
    full-group sort anywhere; rows within the sketch's error of the
    cut may differ from exact mode.

    ``threshold_sample`` (approx mode only, requires ``sample_key_col``)
    estimates the thresholds from a deterministic hash sample of that
    rate instead of the full table. The gate's scoring expression is
    often the dominant scan cost (e.g. a token-fold quality score);
    without sampling the approx mode pays it twice — once in the
    threshold aggregate, once in the gating filter — so it benches ~2x
    the exact mode at small sf even though its *shape* wins at scale.
    A 10% sample cuts the threshold pass to ~scan cost while the
    estimate stays tight wherever groups are large — which is exactly
    the regime the approx mode exists for (a sampled quantile's error
    shrinks as group size grows; at corpus scale a 10% sample is still
    millions of rows per source). Leave it None for small tables or
    when the sketch must see every row.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    if threshold_sample is not None:
        if not approx:
            raise ValueError("threshold_sample requires approx=True")
        if sample_key_col is None:
            raise ValueError("threshold_sample requires sample_key_col")
        if not 0.0 < threshold_sample <= 1.0:
            raise ValueError(f"threshold_sample must be in (0, 1], got {threshold_sample}")
    if approx:
        thr_src = df
        if threshold_sample is not None:
            thr_src = hash_sample(df, threshold_sample, key_col=sample_key_col)
        thr = thr_src.groupBy(group_col).agg(
            F.percentile_approx(score_col, 1.0 - keep_frac, approx_accuracy).alias("__thr")
        ).withColumnRenamed(group_col, "__grp")
        # null-safe equality: a NULL group is a real group in the exact
        # (window) mode, so the threshold join must not drop it. LEFT
        # join: a group with no threshold row (not represented in the
        # sample, or an all-null score column) passes ungated rather
        # than vanishing — the exact mode keeps such groups too.
        return (
            df.join(thr, F.col(group_col).eqNullSafe(F.col("__grp")), "left")
            .filter(F.col("__thr").isNull() | (F.col(score_col) >= F.col("__thr")))
            .drop("__thr", "__grp")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(score_col)
    return (
        df.withColumn("__cd", F.cume_dist().over(w))
        .filter(F.col("__cd") >= F.lit(1.0) - F.lit(float(keep_frac)))
        .drop("__cd")
    )


def unimax_allocation(
    df: DataFrame,
    *,
    group_col: str,
    size_col: str,
    budget_frac: float = 0.5,
    max_epochs: float = 4.0,
) -> DataFrame:
    """UniMax language-sampling allocation (Chung et al. 2023): spend a
    token budget as uniformly as possible across groups (languages)
    without repeating any group more than ``max_epochs`` times.

    The paper's greedy waterfall — visit groups by ascending corpus
    size; give each min(its epoch cap, an equal share of the remaining
    budget) — has a closed form this implements in ONE pass of window
    algebra over the per-group aggregate: once a group is UNCAPPED the
    equal share stays constant for every later (larger) group, so the
    capped set is the maximal contiguous prefix (ascending cap order)
    where cap_r * (n - r + 1) <= budget - cumsum_prev(cap), i.e. a
    running-AND over a windowed inequality.

    The global windows run over the GROUPED result (one row per
    language — bounded, driver-size cardinality), never over corpus
    rows; corpus tokens are consumed by a single groupBy aggregate.
    Budget = ``budget_frac`` * total corpus tokens rides a 1-row
    broadcast.

    Engine-reproducible: both engines order the running sums by the
    same (cap, group) total order, so the sequential float cumsums are
    bit-identical; allocations round to 4, epochs to 6.
    """
    from pyspark.sql import Window

    if not 0.0 < budget_frac:
        raise ValueError(f"budget_frac must be > 0, got {budget_frac}")
    if not 0.0 < max_epochs:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    sizes = df.groupBy(group_col).agg(F.sum(size_col).cast("double").alias("n_tokens"))
    total = sizes.agg((F.sum("n_tokens") * F.lit(float(budget_frac))).alias("budget"))
    w = Window.orderBy(F.col("cap").asc(), F.col(group_col).asc())
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    wr = w.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy(F.lit(1))
    s = (
        sizes.withColumn("cap", F.col("n_tokens") * F.lit(float(max_epochs)))
        .crossJoin(F.broadcast(total))
        .withColumn("r", F.row_number().over(w))
        .withColumn("csum_prev", F.coalesce(F.sum("cap").over(wp), F.lit(0.0)))
        .withColumn("n_groups", F.count(F.lit(1)).over(wall))
        .withColumn(
            "cond",
            (F.col("cap") * (F.col("n_groups") - F.col("r") + 1) <= F.col("budget") - F.col("csum_prev")).cast("int"),
        )
        .withColumn("capped", F.min("cond").over(wr) == 1)
        .withColumn("capped_total", F.sum(F.when(F.col("capped"), F.col("cap")).otherwise(F.lit(0.0))).over(wall))
        .withColumn("n_uncapped", F.sum(F.when(F.col("capped"), 0).otherwise(1)).over(wall))
    )
    alloc = F.when(
        F.col("capped") | (F.col("n_uncapped") == 0), F.col("cap")
    ).otherwise((F.col("budget") - F.col("capped_total")) / F.col("n_uncapped"))
    return s.select(
        F.col(group_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cap").cast("long").alias("cap_tokens"),
        F.round(alloc, 4).alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens"), 6).alias("epochs"),
    )


# Poisson(1) CDF thresholds for the deterministic inverse-CDF draw —
# identical literals on the engine and oracle sides, so every (key,
# replicate) pair gets the same weight in any engine. Tail truncates
# at 9 (P ~ 1.1e-6; the truncation is part of the contract).
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
    0.9999988805752291,
)


# mod-2^31 mixer constants (products stay under 2^62 — ANSI-overflow
# safe in both engines); validated uniform (decile-flat, sd 0.2885)
# with lag-1 / cross-key correlation < 0.07 over 200k draws
_M31 = 2147483648
_MIX_C1 = 1103515245
_MIX_C2 = 1588635695
_MIX_C3 = 1220703125


def row_seed31(key: Column, *, seed: int = 7) -> Column:
    """Per-ROW 31-bit seed: the repo-standard md5 hash, paid ONCE per
    row — never per (row, replicate). The expensive crypto hash sits
    outside the replicate explosion; per-replicate draws are integer
    arithmetic (see :func:`replicate_uniform`). Measured: the md5+conv
    pair per (row, replicate) was ~10x the rest of the bootstrap's
    row-work combined."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}"))), 1, 8),
            16,
            10,
        ).cast("long")
        % F.lit(_M31)
    )


def replicate_uniform(seed31: Column, replicate: Column) -> Column:
    """Uniform [0,1) for (row seed, replicate): two multiply-xorshift
    rounds over the md5 row seed — pure 64-bit-safe integer ops, fully
    codegen'd, identical arithmetic in DuckDB/Python replays."""
    b = replicate.cast("long")
    h = (seed31 + b * F.lit(_MIX_C2)) % F.lit(_M31)
    h = (h * F.lit(_MIX_C1) + F.lit(12345)) % F.lit(_M31)
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = (h * F.lit(_MIX_C3)) % F.lit(_M31)
    h = h.bitwiseXOR(F.shiftright(h, 13))
    return h / F.lit(float(_M31))


def poisson1_from_uniform(u: Column) -> Column:
    """Poisson(1) inverse CDF over a uniform column. IMPORTANT: pass a
    PROJECTED column, not an inline expression — Catalyst inlines a
    non-trivial ``u`` into every CASE branch (the q153 CollapseProject
    hazard; measured 2x on the bootstrap hot path)."""
    w: Column = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def poisson_weight(key: Column, replicate: Column, *, seed: int = 7) -> Column:
    """Deterministic Poisson(1) draw for (key, replicate) as a single
    composed expression — convenience form for row-at-a-time use;
    the bootstrap hot path stages the three pieces through projected
    columns instead (md5 once per row, mixer per replicate, CASE over
    the projected uniform)."""
    return poisson1_from_uniform(
        replicate_uniform(row_seed31(key, seed=seed), replicate)
    )


def poisson_bootstrap_ci(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    key_col: str,
    n_replicates: int = 100,
    alpha: float = 0.05,
    seed: int = 7,
) -> DataFrame:
    """Per-group bootstrap confidence interval for the MEAN of
    ``value_col`` — the Poisson bootstrap (Chamandy et al. 2012,
    "Estimating uncertainty for massive data streams"): instead of
    resampling n rows with replacement (which needs global coordination
    — impossible in one pass over a distributed table), each row enters
    replicate b with an independent Poisson(1) weight. Replicate means
    are weighted means; the CI is the empirical (alpha/2, 1-alpha/2)
    quantile band over the replicates.

    Output: ``(group, n, mean, ci_lo, ci_hi)``.

    Scale shape: ONE pass — rows explode to ``n_replicates`` lightweight
    (group, b, w, w*y) tuples (expression-side sequence, no driver
    loop), one (group, b) aggregate with map-side combine (bounded at
    |G| * B rows per task), one |G| * B -> |G| quantile reduction.
    Weights are the deterministic md5 inverse-CDF draw, so the whole
    procedure is reproducible cross-engine (the q94/q197 determinism
    contract) — a "random" bootstrap you can hash-check.
    """
    if n_replicates < 2:
        raise ValueError(f"n_replicates must be >= 2, got {n_replicates}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    y = F.col(value_col).cast("double")
    # staged projections: md5 row seed BEFORE the replicate explosion
    # (once per row), mixer per replicate, inverse-CDF CASE over the
    # PROJECTED uniform (inlining u into the CASE doubles the work —
    # poisson1_from_uniform's docstring)
    exploded = (
        df.select(
            F.col(group_col).alias("group"),
            y.alias("__y"),
            row_seed31(F.col(key_col), seed=seed).alias("__s"),
        )
        .select(
            "group",
            "__y",
            "__s",
            F.explode(F.sequence(F.lit(1), F.lit(n_replicates))).alias("b"),
        )
        .select(
            "group",
            "b",
            "__y",
            replicate_uniform(F.col("__s"), F.col("b")).alias("__u"),
        )
        .select(
            "group", "b", "__y", poisson1_from_uniform(F.col("__u")).alias("w")
        )
    )
    # a replicate that drew weight 0 for EVERY row of a group has no
    # resample to take a mean of — drop it (P ~ e^-n; only reachable
    # for tiny groups, but ANSI mode would turn 0/0 into a job error)
    rep_means = (
        exploded.groupBy("group", "b")
        .agg(
            F.sum(F.col("w") * F.col("__y")).alias("__s"),
            F.sum("w").alias("__sw"),
        )
        .filter(F.col("__sw") > 0)
        .select("group", "b", (F.col("__s") / F.col("__sw")).alias("rep_mean"))
    )
    base = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n"), F.avg(y).alias("mean")
    )
    qs = rep_means.groupBy("group").agg(
        F.percentile("rep_mean", F.lit(alpha / 2)).alias("ci_lo"),
        F.percentile("rep_mean", F.lit(1 - alpha / 2)).alias("ci_hi"),
    )
    return base.join(qs, "group").select("group", "n", "mean", "ci_lo", "ci_hi")


def stratified_sample_exact(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
    seed: int = 42,
) -> DataFrame:
    """EXACT fixed-n-per-stratum sample — the eval-set construction
    tool the rate-based :func:`stratified_sample` can't provide (a
    rate gives a BINOMIAL count per stratum; an eval harness wants
    exactly n rows per language/source/label).

    Deterministic and engine-replayable: within each stratum rows are
    ranked by the md5 hash fraction of ``key_col`` (:func:`sample_key`
    — same verdict every run/engine/retry) with the raw key as
    tiebreak, and rank <= ``n_per_stratum`` survives. Strata smaller
    than n are kept whole.

    Scale shape: ONE hash exchange on the stratum key; the rank<=n
    filter is planner-recognized (WindowGroupLimit since Spark 3.5)
    so each stratum keeps a bounded top-n heap per partition instead
    of fully sorting the stratum. Adds ``sample_rank`` (1-based).
    NULL strata/keys excluded (no stable rank exists for them)."""
    from pyspark.sql import Window

    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    clean = df.filter(F.col(strata_col).isNotNull() & F.col(key_col).isNotNull())
    w = Window.partitionBy(strata_col).orderBy(
        sample_key(F.col(key_col), seed=seed).asc(), F.col(key_col).asc()
    )
    return (
        clean.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )
