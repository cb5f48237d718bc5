"""Dense, gap-free surrogate keys without a single-partition window.

The reference assigns surrogate ids with driver-side counters seeded
from ``SELECT id ... ORDER BY id DESC LIMIT 1``
(``/root/reference/app/main.py:33-38``, ``app/db/postgres.py:251-260``).
The naive Spark translation — ``row_number() OVER (ORDER BY ...)`` —
funnels every row through ONE partition: a non-starter at 100 TB.

Technique (SURVEY.md §4 custom-work item 1): range-partition by the
order columns so partitions are globally ordered, number rows *within*
each partition in parallel, then add per-partition offsets computed
from a tiny (num_partitions-row) count aggregate broadcast back. Two
narrow passes, no global sort bottleneck, ids are dense and start at
``start``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign dense ids ``start, start+1, ...`` in ``order_cols`` order.

    ``order_cols`` should be a deterministic total order (include a
    unique tie-break column) so ids are reproducible run-to-run — the
    idempotence property the reference's IdIndex protects
    (``app/db/id_index.py:22-25``).
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    ranged = ranged.withColumn("__pid", F.spark_partition_id())

    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in order_cols])
    # persist BEFORE branching: the counts aggregate and the final join
    # are separate jobs, and AQE may coalesce the range-shuffle into a
    # different partition layout per job — spark_partition_id must be
    # observed once, not recomputed (otherwise ids duplicate/skip).
    numbered = ranged.withColumn("__rn", F.row_number().over(w)).persist()

    # Tiny aggregate: one row per partition → cumulative offsets.
    counts = numbered.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))).select(
        "__pid", "__off"
    )

    out = numbered.join(F.broadcast(offsets), "__pid").withColumn(
        id_col, (F.col("__rn") + F.col("__off") + F.lit(start - 1)).cast("long")
    ).drop("__pid", "__rn", "__off")
    # Eagerly materialize the result, then RELEASE the persist: a SQL
    # persist() lives in Spark's global CacheManager until explicitly
    # unpersisted, so a long-running incremental sync (≥6 calls per
    # period) would otherwise accumulate pinned frames without bound.
    # localCheckpoint blocks are block-manager storage cleaned by the
    # ContextCleaner once the frame is unreferenced, and the cut
    # lineage keeps the assigned ids stable for every later consumer.
    out = out.localCheckpoint(eager=True)
    numbered.unpersist()
    return out
