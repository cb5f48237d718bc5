"""Distributed 2-D skyline (Pareto frontier) — no dominance join.

The skyline of a set under (minimize x, maximize y) is the rows no
other row dominates (x' <= x, y' >= y, one strict). The naive plan is
a quadratic NOT EXISTS theta self-join — the class this repo bans. In
2-D the frontier is a monotone staircase, so dominance reduces to a
PREFIX MAXIMUM in x-order, and a prefix max distributes the same way
the surrogate-id offsets do (operators/surrogate.py): bucket by x
range, per-bucket local window, and a bucket-level running max —
bounded by the bucket count, not the data — broadcast back. One wide
shuffle (the bucket hash), one bounded-frame window, zero pair rows.

Semantics pinned by the oracle's NOT EXISTS replay: a row survives iff
  max{y' : x' <  x}  <  y      (strictly-cheaper rows can't reach y)
  max{y' : x' == x}  == y      (same-x rows: only the best y's survive)
so duplicate (x, y) points all survive (neither dominates the other —
the at-least-one-strict clause), matching the textbook definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows on the (minimize ``min_col``, maximize ``max_col``) Pareto
    frontier. All input columns pass through.

    Plan shape: one scalar min/max probe (two numbers) fixes the bucket
    width; rows group by (bucket, x) to per-x maxima — the frame every
    window below runs on is one row per DISTINCT x, never per input
    row; the cross-bucket prefix max runs on <= n_buckets rows (bounded
    by construction, the dense-ids-offsets pattern); survivors join
    back by (x, y) equality. Cost: one shuffle on x + broadcast joins.
    """
    x = F.col("__x")
    pts = df.withColumn("__x", F.col(min_col).cast("double")).withColumn(
        "__y", F.col(max_col).cast("double")
    )
    lo, hi = pts.agg(F.min("__x"), F.max("__x")).collect()[0]  # scalar probe
    if lo is None:
        return df.where(F.lit(False))
    w = (float(hi) - float(lo)) / n_buckets or 1.0
    bucket = F.least(
        F.floor((x - F.lit(float(lo))) / F.lit(w)), F.lit(n_buckets - 1)
    ).cast("int")
    pts = pts.withColumn("__b", bucket)

    # per-(bucket, x) maxima: the windows below see one row per distinct x
    gx = pts.groupBy("__b", "__x").agg(F.max("__y").alias("__gy"))
    in_bucket = Window.partitionBy("__b").orderBy("__x")
    strict_prev = F.max("__gy").over(
        in_bucket.rowsBetween(Window.unboundedPreceding, -1)
    )
    gx = gx.withColumn("__prev", strict_prev)

    # bucket-level running max over <= n_buckets rows (bounded frame)
    bmax = gx.groupBy("__b").agg(F.max("__gy").alias("__bm"))
    cross = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    bmax = bmax.withColumn("__carry", F.max("__bm").over(cross))

    # survivor test per distinct x: y must beat every strictly-smaller x
    # (carry from earlier buckets + in-bucket strict prefix), and equal
    # the same-x maximum
    thresh = gx.join(F.broadcast(bmax.select("__b", "__carry")), "__b").select(
        "__x",
        "__gy",
        F.greatest(
            F.coalesce(F.col("__prev"), F.lit(float("-inf"))),
            F.coalesce(F.col("__carry"), F.lit(float("-inf"))),
        ).alias("__dom"),
    )
    frontier = thresh.where(F.col("__gy") > F.col("__dom")).select(
        F.col("__x").alias("__fx"), F.col("__gy").alias("__fy")
    )
    # join back by (x, y) equality — the frontier is usually tiny and
    # AQE will broadcast it, but nothing REQUIRES that: a degenerate
    # all-frontier input still plans an equi-join
    out = pts.join(
        frontier,
        (F.col("__x") == F.col("__fx")) & (F.col("__y") == F.col("__fy")),
    )
    return out.select(df.columns)
