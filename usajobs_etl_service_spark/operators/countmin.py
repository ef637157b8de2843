"""Count-min sketch: mergeable, bounded-size point-frequency estimation
(Cormode & Muthukrishnan 2005, "An improved data stream summary: the
count-min sketch and its applications").

Completes the mergeable-sketch family (stats.py: HLL distinct + GK
quantiles; heavyhitters.py: Misra-Gries top items) with the classic
upper-bounding frequency estimator: ``est(x) >= true(x)`` always, and
``est(x) <= true(x) + (e/width) * N`` with probability
``1 - exp(-depth)``. The reference engine has no frequency sketch (its
stats surface is exact COUNT/GROUP BY, reference ``etl/etl.py:560-607``);
this is a scale extension in the same spirit as the HLL/GK operators.

Design (all pure DataFrame algebra, engine-reproducible):

- **Hashing** is the repo-standard md5-prefix scheme (sampling.py:23):
  ``conv(substr(md5(item || '#cms' || depth), 1, 8), 16, 10) % width``.
  Deterministic across engines, so a DuckDB oracle can rebuild the
  IDENTICAL sketch — the estimator itself is oracle-checked, not just
  an exact regime of it.
- **Build** is ONE shuffle keyed by (depth, bucket). The depth explode
  multiplies token rows by ``depth`` before the exchange, but map-side
  partial aggregation caps each task's shuffle output at
  ``depth * width`` rows regardless of corpus size — at 100 TB the
  exchange moves ≤ depth*width rows per task, not the corpus.
- **Sketch representation** is sparse long rows ``(depth, bucket,
  cnt)`` — at most ``depth * width`` of them by construction, so the
  estimate-time join can ALWAYS broadcast the sketch side, and
  ``cms_merge`` (register-wise add, the mergeability that makes the
  sketch shardable across days/sources at corpus scale) is a groupBy
  over a provably tiny input.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(item: Column, depth: Column, width: int) -> Column:
    """Row hash for one sketch row: md5-prefix of ``item#cms<depth>``
    mod ``width`` (engine-reproducible; the DuckDB oracle repeats the
    identical expression)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(item.cast("string"), F.lit("#cms"), depth.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (h % F.lit(width)).alias("bucket")


def _with_depths(df: DataFrame, depth: int) -> DataFrame:
    return df.select(
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth"), "*"
    )


def cms_build(
    items: DataFrame, col: str, *, depth: int = 4, width: int = 4096
) -> DataFrame:
    """Build a count-min sketch over the values of ``items[col]``
    (NULLs excluded, mirroring heavy_hitters_exact's contract).

    Returns sparse rows ``(depth int, bucket long, cnt long)`` — at most
    ``depth * width`` rows. One (depth, bucket) shuffle; partial
    aggregation bounds every task's shuffle write at depth*width rows.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    rows = _with_depths(
        items.select(F.col(col).cast("string").alias("item")).where(
            F.col("item").isNotNull()
        ),
        depth,
    )
    return rows.groupBy(
        "depth", cms_bucket(F.col("item"), F.col("depth"), width)
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Register-wise sum of sketches built with the SAME depth/width —
    the distributive merge that lets shards (per day / per source /
    per executor epoch) build independently and combine losslessly:
    CMS(A ∪ B) == merge(CMS(A), CMS(B)) exactly."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    unioned = reduce(DataFrame.unionByName, sketches)
    return unioned.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, *, depth: int = 4, width: int = 4096
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` values:
    ``min`` over the sketch's ``depth`` rows, 0 for never-seen buckets.

    The sketch side is broadcast — sound by construction, since a
    sketch is ≤ depth*width rows no matter how large the corpus that
    built it. Returns ``(item string, est long)``.
    """
    pb = _with_depths(
        probes.select(F.col(col).cast("string").alias("item")).where(
            F.col("item").isNotNull()
        ),
        depth,
    ).select("item", "depth", cms_bucket(F.col("item"), F.col("depth"), width))
    joined = pb.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return joined.groupBy("item").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )
