"""As-of (point-in-time) join — a custom operator Spark lacks natively
(SURVEY.md §2.11 class; the canonical time-series/feature-store join).

For each left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key.

Scalable formulation: **union + window**, NOT a range join. Tag both
sides, union them, and per key take ``last(right-values, ignorenulls)``
over rows ordered by (ts, side) — the right row "carries forward" until
a newer one appears. One hash-partition shuffle on the key; no
inequality cross-join, no per-key materialization; AQE skew handling
applies. A naive ``l.join(r, l.key==r.key & r.ts<=l.ts)`` + max-window
explodes to |l|x|r| per key and is the classic 100 TB trap.

Tolerance (``max_lookback``) bounds staleness, like a feature-store
TTL: matches older than the window are nulled out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    max_lookback: Column | None = None,
) -> DataFrame:
    """Left as-of join. Right value columns arrive as ``<col><suffix>``;
    left rows with no prior right row keep NULLs.

    Ties (``right.ts == left.ts``) match — the right side sorts before
    the left at equal timestamps, mirroring ``ASOF JOIN ... ON l.ts >=
    r.ts`` semantics.

    The matched right row carries forward as ONE struct, never as
    per-column ``last(ignorenulls)`` streams (fuzz-sweep find: column-
    wise carry stitches FIELDS FROM DIFFERENT RIGHT ROWS together the
    moment a newer right row holds a NULL — the older non-NULL value
    survives next to the newer row's timestamp). Duplicate right rows
    on (key, ts) resolve deterministically to the GREATEST packed
    struct (field-lexicographic over ``right_cols`` then ``right_ts``,
    NULL smallest) — for a single value column that is simply
    "largest value wins, NULL last", which a SQL oracle replays with
    ``ORDER BY value DESC NULLS LAST``.
    """
    right_cols = right_cols or [c for c in right.columns if c not in set(on) | {right_ts}]

    pack_fields = [F.col(c).alias(f"v_{c}") for c in right_cols] + [
        F.col(right_ts).alias("rts")
    ]
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts first at equal ts -> ties match
        F.struct(*pack_fields).alias("__rpack"),
    )
    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    l_tag = l_tag.withColumn(
        "__rpack", F.lit(None).cast(r_tag.schema["__rpack"].dataType)
    )
    for c in left.columns:
        if c not in set(on):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # __rpack in the ordering makes the equal-ts winner deterministic:
    # the last (greatest) right struct in the frame is what last() sees
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__rpack")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *unioned.columns,
        F.last("__rpack", ignorenulls=True).over(w).alias("__c_pack"),
    )
    out = carried.filter(F.col("__side") == 1)
    if max_lookback is not None:
        fresh = F.col("__c_pack.rts") >= (F.col("__ts") - max_lookback)
        out = out.withColumn("__c_pack", F.when(fresh, F.col("__c_pack")))
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(f"__c_pack.v_{c}").alias(f"{c}{suffix}") for c in right_cols],
        F.col("__c_pack.rts").alias(f"{right_ts}{suffix}"),
    )
