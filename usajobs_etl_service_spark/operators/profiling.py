"""Dataset profiling and statistical outlier detection — the data-
quality surface a curation pipeline runs before and after every
transform (null/distinct/moment profiles; z-score anomaly flags).

Profile metrics come out in LONG form (column, metric, value) so a
profile is one UNION-able artifact per snapshot: store it per
partition/day and diff profiles to detect drift.

Scale notes: the profile is ONE aggregate pass per table (Catalyst
plans the multi-distinct via Expand — at 100 TB swap exact
``countDistinct`` for ``approx_count_distinct`` with
``exact_distinct=False``, turning the pass into plain mergeable
partials). Anomaly stats are a per-entity aggregate joined back (AQE
broadcasts the stats side when it fits) — never a global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    *,
    numeric_cols: list[str] = (),
    string_cols: list[str] = (),
    exact_distinct: bool = True,
) -> DataFrame:
    """(column, metric, value double) long-form profile: numeric cols
    report n/n_null/n_distinct/min/max/mean; string cols report
    n/n_null/n_distinct/avg_len/max_len. Means and avg lengths round
    to 4 for cross-engine stability."""
    if not numeric_cols and not string_cols:
        raise ValueError("profile needs at least one column")
    ndv = (lambda c: F.countDistinct(c)) if exact_distinct else (
        lambda c: F.approx_count_distinct(c)
    )
    aggs: list[Column] = []
    labels: list[tuple[str, str]] = []

    def add(col: str, metric: str, expr: Column) -> None:
        aggs.append(expr.cast("double").alias(f"{col}__{metric}"))
        labels.append((col, metric))

    n_rows = F.count(F.lit(1))
    for c in numeric_cols:
        col = F.col(c)
        add(c, "n", n_rows)
        add(c, "n_null", n_rows - F.count(col))
        add(c, "n_distinct", ndv(col))
        add(c, "min", F.min(col))
        add(c, "max", F.max(col))
        add(c, "mean", F.round(F.avg(col.cast("double")), 4))
    for c in string_cols:
        col = F.col(c)
        add(c, "n", n_rows)
        add(c, "n_null", n_rows - F.count(col))
        add(c, "n_distinct", ndv(col))
        add(c, "avg_len", F.round(F.avg(F.length(col).cast("double")), 4))
        add(c, "max_len", F.max(F.length(col)))
    wide = df.agg(*aggs)
    # one-row wide -> long via stack (still a single aggregate job)
    pairs = ", ".join(f"'{c}', '{m}', `{c}__{m}`" for c, m in labels)
    return wide.selectExpr(
        f"stack({len(labels)}, {pairs}) AS (column_name, metric, value)"
    )


def zscore_anomalies(
    df: DataFrame,
    *,
    entity_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value is more than ``threshold`` sample standard
    deviations from their ENTITY's mean. Per-entity stats are one
    aggregate; the join back is an equi-join on the entity key (AQE
    broadcasts the stats side when the entity count is bounded);
    entities with zero variance or a single row produce no flags
    (NULL/zero stddev guarded)."""
    ent = F.col(entity_col)
    stats = df.groupBy(ent.alias("__e")).agg(
        F.avg(F.col(value_col).cast("double")).alias("__mu"),
        F.stddev_samp(F.col(value_col).cast("double")).alias("__sd"),
    )
    joined = df.join(stats, ent == F.col("__e"))
    z = F.try_divide(F.col(value_col).cast("double") - F.col("__mu"), F.col("__sd"))
    return (
        joined.filter(F.col("__sd").isNotNull() & (F.col("__sd") > 0))
        .withColumn("z", F.round(z, 3))
        .filter(F.abs(F.col("z")) > threshold)
        .select(F.col(id_col), ent, F.col(value_col), "z")
    )


def histogram(
    df: DataFrame,
    *,
    value_col: str,
    width: float,
    group_cols: list[str] = (),
) -> DataFrame:
    """Equi-width histogram: bucket = floor(value / width), counted per
    (group, bucket). Pure expression + one aggregate — the profile-
    grade distribution summary (for quantile-grade accuracy at unknown
    ranges, use the GK sketch family, q79/q88)."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    b = F.floor(F.col(value_col).cast("double") / F.lit(float(width))).cast("int")
    return (
        df.groupBy(*group_cols, b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def mann_whitney_u(
    df: DataFrame,
    *,
    value_col: str,
    label_col: str,
    label_a: str,
    label_b: str,
) -> DataFrame:
    """Exact tie-corrected Mann-Whitney U (Wilcoxon rank-sum) test
    between the ``value_col`` distributions of two labeled groups —
    the nonparametric drift test complementing KS (q123: max CDF gap)
    with a rank-sum location statistic, robust where moment-based
    z-tests (q131) assume normality.

    Scale shape mirrors the KS query: per-value group counts aggregate
    first (ONE shuffle on the value; bounded by the distinct support),
    then the cumulative pooled count — which yields every tie group's
    midrank ((csum - t) + (t+1)/2 — comes from
    distributed_order.ordered_cumsum's range exchange + carry-in
    offsets, never a single-task window over the support. The final
    reduction is a scalar aggregate.

    Exactness: midranks are half-integers and per-value products stay
    below 2^53, so U and the rank sum are EXACT doubles in any engine
    and any summation order; the tie-corrected normal approximation

        z = (U - n_a*n_b/2) / sqrt(n_a*n_b/12 * ((N+1) - sum(t^3-t)/(N(N-1))))

    is one deterministic float expression over those exact inputs
    (round-6, the engine-parity contract)."""
    from usajobs_etl_service_spark.operators.distributed_order import ordered_cumsum

    pts = (
        df.filter(F.col(label_col).isin(label_a, label_b) & F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(
            F.sum(F.when(F.col(label_col) == label_a, 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col(label_col) == label_b, 1).otherwise(0)).alias("b"),
        )
        .withColumn("t", F.col("a") + F.col("b"))
    )
    cum = ordered_cumsum(pts, [F.col(value_col).asc()], ["t"])
    avg_rank = (F.col("cum_t") - F.col("t")) + (F.col("t") + 1) / 2.0
    s = cum.agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum(F.col("a") * avg_rank).alias("r_a"),
        F.sum(F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")).alias("tie_sum"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    n = na + nb
    u = F.col("r_a") - na * (na + 1) / 2.0
    mu = na * nb / 2.0
    sigma = F.sqrt(na * nb / 12.0 * ((n + 1) - F.col("tie_sum") / (n * (n - 1.0))))
    return s.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(u, 4).alias("u_stat"),
        F.round(F.try_divide(u - mu, sigma), 6).alias("z"),
    )


def profile_table(
    df: DataFrame, cols: list[str] | None = None, *, approx: bool = False
) -> DataFrame:
    """One row per profiled column — the WIDE companion to ``profile``
    (whose long form carries only double values and so cannot report
    extrema of string/timestamp columns):
    (column, n_rows, n_nulls, n_distinct, min_value, max_value).

    ``n_distinct`` is EXACT by default (count distinct, NULLs excluded
    — the SQL convention); ``min_value``/``max_value`` are the column
    extrema cast to string (NULL when the column is all-NULL). One
    aggregate pass total.

    ``approx=True`` swaps every countDistinct for
    ``approx_count_distinct`` (HLL++ at Spark's default rsd=0.05 —
    ~5% relative standard error, occasionally worse; the A2 discipline
    of SURVEY §4). Why this matters at 100 TB: Catalyst
    plans k EXACT multi-column distincts through ONE Expand that
    multiplies every input row by (k + 1) — a 16-column profile of a
    100 TB table streams 1.7 PB through the aggregate. HLL partials
    are plain mergeable map-side state: no Expand, no row
    multiplication (plan-pinned in tests/test_profiling.py), which is
    the shape a nightly wide-table profile must have.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table: need at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    from pyspark.sql.types import MapType

    ndv = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for j, c in enumerate(cols):
        orderable = not isinstance(df.schema[c].dataType, MapType)
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{j}"),
            # map columns are neither orderable nor groupable in Spark:
            # report NULL distinct/extrema instead of failing the pass
            (ndv(F.col(c)) if orderable else F.lit(None).cast("long")).alias(f"__nd_{j}"),
            (F.min(F.col(c)).cast("string") if orderable else F.lit(None).cast("string")).alias(f"__mn_{j}"),
            (F.max(F.col(c)).cast("string") if orderable else F.lit(None).cast("string")).alias(f"__mx_{j}"),
        ]
    one = df.agg(*aggs)
    def _sql_str(name: str) -> str:
        # the column NAME becomes a SQL string literal in stack();
        # escape it (a quote in a parquet column name is legal and
        # would otherwise abort the whole profile pass)
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = ", ".join(
        f"{_sql_str(c)}, __n - __nn_{j}, __nd_{j}, __mn_{j}, __mx_{j}"
        for j, c in enumerate(cols)
    )
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
