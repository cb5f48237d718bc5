"""Dense, gap-free surrogate keys without a single-partition window.

The reference assigns surrogate ids with driver-side counters seeded
from ``SELECT id ... ORDER BY id DESC LIMIT 1``
(``/root/reference/app/main.py:33-38``, ``app/db/postgres.py:251-260``).
The naive Spark translation — ``row_number() OVER (ORDER BY ...)`` —
funnels every row through ONE partition: a non-starter at 100 TB.

Technique (SURVEY.md §4 custom-work item 1): split the data into
order-aligned buckets, number rows *within* each bucket in parallel,
then add per-bucket offsets computed from a tiny (num_buckets-row)
count aggregate broadcast back. Two narrow passes, no global sort
bottleneck, ids are dense and start at ``start``.

The correctness hazard all strategies guard: the per-bucket counts and
the final numbering are separate Spark jobs, and every row must land in
the same bucket with the same within-bucket rank in both — either by
freezing the bucketed data once (``checkpoint`` / ``persist``) or by
deriving the bucket from the row's own values (``sample``).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: first-order-column dtypes with an order-preserving numeric projection,
#: enabling single-job approx_percentile boundaries in strategy="sample".
_NUMERIC_BOUNDARY_TYPES = {
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "date",
    "timestamp",
    "timestamp_ntz",
}


#: "sample"-strategy bucket sizing when footer row counts are known:
#: aim for this many rows per bucket (a ~250k-row per-task sort is
#: cheap), capped by num_partitions so big inputs still fan out wide.
_TARGET_ROWS_PER_BUCKET = 250_000


def with_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "id",
    start: int = 1,
    num_partitions: int | None = None,
    strategy: str = "checkpoint",
    release: list | None = None,
    first_col_range: tuple | None = None,
    rowgroup_stats: list | None = None,
) -> DataFrame:
    """Assign dense ids ``start, start+1, ...`` in ``order_cols`` order.

    ``order_cols`` should be a deterministic total order (include a
    unique tie-break column) so ids are reproducible run-to-run — the
    idempotence property the reference's IdIndex protects
    (``app/db/id_index.py:22-25``).

    Strategies (pick by what the *input* costs to recompute):

    - ``"checkpoint"`` (default, safe everywhere): range-shuffle, stamp
      ``spark_partition_id``, eagerly ``localCheckpoint`` ONCE. The
      blocks are ContextCleaner-managed (no global-CacheManager entry
      to leak) and double as a cache for downstream consumers. Cost:
      one full write of the frame to block storage.
    - ``"persist"``: same shape, but the frozen intermediate is
      ``persist()``-ed (deserialized memory — cheapest to fill and
      re-read) and appended to the required ``release`` list; the
      CALLER must ``unpersist()`` those handles after its final action
      on the result (SQL persists pin global CacheManager entries until
      explicitly released). Fastest for a multi-consumer pipeline
      period; unusable when nobody can release (e.g. a query handed to
      an external runner).
    - ``"sample"``: never materializes anything. Order-aligned buckets
      are derived from the row's own ``order_cols`` values against
      boundary keys collected once (one tiny column-pruned job), so
      every stage is freely recomputable and the full plan stays
      visible to Catalyst and the plan-shape gates. At 100 TB this is
      the shape you want — the frame is scanned twice (columnar, the
      counts pass prunes to ``order_cols``) and shuffled once, but
      never written to block storage. Requires ``order_cols`` to be a
      null-free unique key (recomputation must not reorder ties).
      ``first_col_range=(lo, hi)`` (numeric/date first column only)
      supplies the value range from table STATISTICS — e.g. parquet
      footer min/max, catalog stats — so even the boundary job is
      skipped: uniform boundaries are derived driver-side and the
      operator runs zero jobs beyond the two data passes. Balance then
      depends on the first column being roughly uniform over the range;
      correctness never does.
      ``rowgroup_stats=[(num_rows, min, max, null_count), ...]`` (per
      parquet row group of the first order column) fuses footer ROW
      COUNTS in too: bucket count is sized to ``_TARGET_ROWS_PER_BUCKET``
      from the known total (capped at ``num_partitions``, so 100 TB
      inputs still fan out to the full width), and when no row group
      straddles a bucket boundary the per-bucket counts are EXACT from
      the footers alone — the counts pass disappears and the offsets
      frame is a driver-side literal: ONE data pass total.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    if strategy == "sample":
        return _dense_ids_by_sampled_bounds(
            df, order_cols, id_col, start, num_partitions, first_col_range,
            rowgroup_stats,
        )
    if strategy == "persist" and release is None:
        raise ValueError("strategy='persist' needs a release list the caller will unpersist")
    if strategy not in ("checkpoint", "persist"):
        raise ValueError(f"unknown strategy {strategy!r}")

    ranged = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in order_cols])
    # Freeze ONCE, before branching: AQE may coalesce the range-shuffle
    # into a different partition layout per job, and upstream shuffles
    # make input row order (hence the range sampler's boundaries)
    # nondeterministic — spark_partition_id must be observed once, not
    # recomputed (otherwise ids duplicate/skip).
    numbered = ranged.withColumn("__rn", F.row_number().over(w))
    if strategy == "persist":
        numbered = numbered.persist()
        release.append(numbered)
    else:
        numbered = numbered.localCheckpoint(eager=True)

    return _number_buckets(
        numbered, "__pid", order_cols, id_col, start, has_rank=True
    )


def _number_buckets(
    df: DataFrame,
    bucket_col: str,
    order_cols: list[str],
    id_col: str,
    start: int,
    has_rank: bool = False,
    literal_counts: list[int] | None = None,
) -> DataFrame:
    """row_number within bucket + broadcast cumulative bucket offsets.

    ``has_rank`` is an explicit contract (the checkpoint path computes
    ``__rn`` before freezing) — never inferred from the column list, so
    a caller frame that happens to carry a ``__rn`` column can't smuggle
    stale ranks in. The output stays LAZY: downstream actions re-run
    only a broadcast join against the ≤num_buckets-row offsets frame.

    ``literal_counts[i]`` = exact row count of bucket i (e.g. proven
    from parquet row-group footers): the counts job is skipped entirely
    and the offsets frame is a driver-side literal.
    """
    if has_rank:
        numbered = df
    else:
        w = Window.partitionBy(bucket_col).orderBy(*[F.col(c).asc() for c in order_cols])
        numbered = df.withColumn("__rn", F.row_number().over(w))
    if literal_counts is not None:
        if len(literal_counts) == 1:
            # lone bucket: the offset is the constant 0 — no join at all
            return (
                numbered.withColumn(
                    id_col, (F.col("__rn") + F.lit(start - 1)).cast("long")
                )
                .drop(bucket_col, "__rn")
            )
        acc, rows = 0, []
        for i, c in enumerate(literal_counts):
            rows.append((i, acc))
            acc += c
        offsets = df.sparkSession.createDataFrame(
            rows, f"{bucket_col} int, __off long"
        )
        return (
            numbered.join(F.broadcast(offsets), bucket_col)
            .withColumn(
                id_col,
                (F.col("__rn") + F.col("__off") + F.lit(start - 1)).cast("long"),
            )
            .drop(bucket_col, "__rn", "__off")
        )
    counts = numbered.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("__cnt"))
    # ≤num_buckets rows from here on: coalesce(1) makes the cumsum
    # window's AllTuples requirement already-satisfied (CoalesceExec
    # reports SinglePartition), deleting the Exchange(SinglePartition)
    # stage the planner otherwise inserts — one fewer sequential stage
    # boundary on an operator whose cost at small SF is pure scheduling.
    w_off = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.coalesce(1).withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select(bucket_col, "__off")
    return (
        numbered.join(F.broadcast(offsets), bucket_col)
        .withColumn(id_col, (F.col("__rn") + F.col("__off") + F.lit(start - 1)).cast("long"))
        .drop(bucket_col, "__rn", "__off")
    )


def with_dense_ids_grouped(
    df: DataFrame,
    order_cols: list[str],
    group_col: str,
    starts: dict,
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """SEVERAL independent dense-id sequences from ONE range shuffle
    and ONE freeze: group g's rows get ``starts[g], starts[g]+1, ...``
    in ``order_cols`` order. Output-equivalent to calling
    ``with_dense_ids`` once per group over the filtered subsets
    (property-pinned), but the (often wide) frame is materialized to
    checkpoint blocks ONCE instead of once per group — the sync
    pipeline's mint/transfer fact split pays one checkpoint of
    ``rows_wa`` here where two half-frame checkpoints (same total
    bytes, twice the jobs and shuffles) used to run.

    Shape: the same order-aligned range shuffle as ``with_dense_ids``
    (group membership does NOT partition the shuffle — ids of every
    group stay globally order-aligned), ranks from a window over
    (bucket, group), per-(bucket, group) counts, and per-group
    cumulative offsets + seed folded in through one broadcast join.
    ``group_col`` values must all be keys of ``starts``."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(
        num_partitions, *[F.col(c) for c in order_cols]
    )
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid", group_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    # same freeze-once contract as with_dense_ids: counts and final
    # numbering must observe one bucketing, not one per job
    numbered = ranged.withColumn("__rn", F.row_number().over(w))
    numbered = numbered.localCheckpoint(eager=True)
    counts = numbered.groupBy("__pid", group_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = Window.partitionBy(group_col).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        counts.coalesce(1)  # ≤ num_buckets × |groups| rows (see _number_buckets)
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)))
        .select("__pid", group_col, "__off")
    )
    seed = F.create_map(
        *[x for g, s in starts.items() for x in (F.lit(g), F.lit(s))]
    )
    return (
        numbered.join(F.broadcast(offsets), ["__pid", group_col])
        .withColumn(
            id_col,
            (
                F.col("__rn")
                + F.col("__off")
                + seed[F.col(group_col)]
                - 1
            ).cast("long"),
        )
        .drop("__pid", "__rn", "__off")
    )


def _dense_ids_by_sampled_bounds(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    start: int,
    num_partitions: int,
    first_col_range: tuple | None = None,
    rowgroup_stats: list | None = None,
) -> DataFrame:
    """Fully-lazy dense ids: value-derived order-aligned buckets.

    Bucketing by the FIRST order column is order-aligned for the
    composite order too (rows sharing a first-column value always share
    a bucket — coarser, still monotone), which unlocks a single-job
    ``approx_percentile`` boundary computation whenever that column has
    an order-preserving numeric projection. Otherwise fall back to a
    count + collect-sample of the composite key. Either way the bucket
    is a pure expression over the row's own values — deterministic
    under recomputation with no persist, no checkpoint, and no reliance
    on ``spark_partition_id``. The boundary comparisons are emitted as
    a plain ``+``-chain of WHENs (whole-stage-codegen'd), NOT a
    higher-order ``F.aggregate`` lambda (interpreted per row — measured
    ~7× slower on 150k rows).
    """
    first = order_cols[0]
    dtype = dict(df.dtypes)[first]

    bucket = None
    literal_counts = None
    if dtype in _NUMERIC_BOUNDARY_TYPES:
        if dtype == "date":
            proxy = F.unix_date(F.col(first))

            def to_num(v):
                import datetime

                return (
                    (v - datetime.date(1970, 1, 1)).days
                    if isinstance(v, datetime.date)
                    else v
                )
        elif dtype.startswith("timestamp"):
            proxy = F.unix_micros(F.col(first).cast("timestamp"))

            def to_num(v):
                # Footer stats arrive as datetimes; the proxy compares
                # against unix_micros under the UTC-pinned session, so
                # naive stats must be interpreted as UTC — a bare
                # .timestamp() would apply the HOST timezone and shift
                # every bucket boundary by the UTC offset, silently
                # corrupting the footer-proved literal bucket counts
                # (duplicate/gapped ids) on any non-UTC machine.
                import datetime

                if isinstance(v, datetime.datetime):
                    if v.tzinfo is None:
                        v = v.replace(tzinfo=datetime.timezone.utc)
                    return int(v.timestamp() * 1_000_000)
                return v
        else:
            proxy = F.col(first)

            def to_num(v):
                return v
        rg = None
        if rowgroup_stats:
            rg = [
                (n, to_num(lo_), to_num(hi_), nulls)
                for (n, lo_, hi_, nulls) in rowgroup_stats
            ]
            # footer row counts size the buckets: small inputs collapse
            # to few (often one) buckets instead of defaultParallelism
            # near-empty ones; large inputs stay at full width
            total = sum(n for n, _, _, _ in rg)
            num_partitions = max(
                1, min(num_partitions, -(-total // _TARGET_ROWS_PER_BUCKET))
            )
            if first_col_range is None and all(
                lo_ is not None and hi_ is not None for _, lo_, hi_, _ in rg
            ):
                first_col_range = (
                    min(lo_ for _, lo_, _, _ in rg),
                    max(hi_ for _, _, hi_, _ in rg),
                )
        if first_col_range is not None:
            # table statistics supplied: uniform boundaries, ZERO jobs
            lo, hi = (to_num(v) for v in first_col_range)
            width = (hi - lo) / num_partitions
            bounds = sorted({int(lo + i * width) for i in range(1, num_partitions)})
        elif num_partitions > 1:
            fractions = [i / num_partitions for i in range(1, num_partitions)]
            row = df.select(
                F.percentile_approx(proxy, fractions, 10_000).alias("b")
            ).first()
            bounds = sorted(set(row["b"] or []))
        else:
            bounds = []
        if bounds:
            bucket = functools.reduce(
                operator.add,
                [F.when(proxy >= F.lit(b), 1).otherwise(0) for b in bounds],
            )
        if rg is not None:
            # EXACT per-bucket counts from footers alone, possible iff no
            # row group straddles a boundary (trivially true for a single
            # bucket). bucket(v) = #bounds <= v = bisect_right(bounds, v);
            # stats cover non-null values only, so any nulls (bucket 0 via
            # the WHEN's otherwise) must be absent or exactly counted.
            import bisect

            counts = [0] * (len(bounds) + 1)
            for n, lo_, hi_, nulls in rg:
                if nulls is None:
                    counts = None
                    break
                if n == nulls:  # all-null group: every row → bucket 0
                    counts[0] += n
                    continue
                if lo_ is None or hi_ is None:
                    counts = None
                    break
                b1 = bisect.bisect_right(bounds, lo_)
                b2 = bisect.bisect_right(bounds, hi_)
                if b1 != b2:
                    counts = None
                    break
                counts[b1] += n - nulls
                counts[0] += nulls
            literal_counts = counts
    elif num_partitions > 1:
        key = F.struct(*[F.col(c).alias(c) for c in order_cols])
        n = df.count()
        if n > 0:
            frac = min(1.0, (100 * num_partitions) / n)
            sample = [
                tuple(r[c] for c in order_cols)
                for r in df.select(*order_cols).sample(False, frac, seed=42).collect()
            ]
            sample.sort()
            step = max(1, len(sample) // num_partitions)
            bounds = sample[step::step][: num_partitions - 1]
            if bounds:
                bucket = functools.reduce(
                    operator.add,
                    [
                        F.when(
                            key
                            >= F.struct(
                                *[F.lit(v).alias(c) for v, c in zip(b, order_cols)]
                            ),
                            1,
                        ).otherwise(0)
                        for b in bounds
                    ],
                )
    if bucket is None:
        bucket = F.lit(0)
    return _number_buckets(
        df.withColumn("__b", bucket),
        "__b",
        order_cols,
        id_col,
        start,
        literal_counts=literal_counts,
    )
