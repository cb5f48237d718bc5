"""Banded range (theta) join via bucketed equi-join.

Engine extension (SURVEY.md §2.C). A raw ``l.v BETWEEN r.v - w AND
r.v + w`` predicate has no equi-key, so Spark plans BroadcastNestedLoop
(O(|L|·|R|) compares) — fatal at 100 TB. Bucketing by ``floor(v / w)``
turns it into an equi-join: each right row joins at most 3 adjacent
buckets, so the planner gets a shuffled hash/sort-merge join and the
band predicate is applied residually. Cost drops to O(|L|+|R|) shuffle
plus short per-bucket scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    band: float,
    extra_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows where ``abs(left_val - right_val) <= band``.

    ``extra_keys`` are additional equi-join keys (same name both sides),
    which co-partition the shuffle further.
    """
    if band <= 0:
        raise ValueError("band must be positive")
    extra_keys = extra_keys or []

    def bucket(col: Column) -> Column:
        return F.floor(col / F.lit(band)).cast("long")

    l = left.withColumn("__bkt", bucket(F.col(left_val)))
    # Each right row is replicated into its own bucket ±1 so every pair
    # within `band` lands in at least one shared bucket.
    r = right.withColumn(
        "__bkt", F.explode(F.array(*[bucket(F.col(right_val)) + F.lit(d) for d in (-1, 0, 1)]))
    )
    full = l["__bkt"] == r["__bkt"]
    for k in extra_keys:
        full = full & (l[k] == r[k])
    band_pred = F.abs(l[left_val] - r[right_val]) <= F.lit(band)
    joined = l.join(r, full & band_pred, how)

    keep = [l[c] for c in left.columns] + [
        r[c] for c in right.columns if c not in set(extra_keys)
    ]
    return joined.select(*keep)
