"""As-of join: for each left row, the most recent right row at-or-before it.

Engine extension (SURVEY.md §2.C "absent from the reference"): the
reference's latest-state tracking (``/root/reference/app/main.py:290-315``)
is a degenerate as-of (right == left stream); this operator generalizes it.

Scalable implementation: the naive form is a non-equi join
(``l.ts >= r.ts`` + argmax), which Spark would plan as a broadcast
nested-loop or a sort-merge with per-key replays. Instead we use the
union+window technique: tag both streams, union them, and carry the
last-seen right payload forward with ``last(..., ignorenulls=True)``
over a per-key time-ordered window. One shuffle on the key, no row
replication, linear in |L|+|R| — this survives 100 TB where the
non-equi join does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Left as-of join.

    Returns ``left`` plus, for each right column in ``value_cols``
    (default: all non-key, non-ts right columns), the matched right
    row's values within the same ``on`` key; NULL when no match exists.
    ``direction`` picks the match (pandas ``merge_asof`` semantics):

    - ``"backward"`` (default): latest right row with
      ``right_ts <= left_ts`` (``<`` if ``strict``);
    - ``"forward"``: earliest right row with ``right_ts >= left_ts``
      (``>`` if ``strict``) — the same one-shuffle union+window pass,
      traversed in descending time;
    - ``"nearest"``: whichever of the two is closer in time, ties to
      the backward match — two window phases over the SAME shuffle
      (Spark re-sorts within partitions, no second exchange).

    Ties on ``right_ts`` resolve to the greatest payload struct
    (deterministic regardless of partitioning).

    ``tolerance`` (pandas ``merge_asof(tolerance=...)``): a maximum
    time distance for a match — a Column (e.g.
    ``F.expr("INTERVAL 2 DAYS")`` for timestamp axes) or a plain number
    for numeric axes. A carried match farther than the tolerance is
    nulled AFTER the carry, so it costs one row-local comparison and
    changes nothing about the one-shuffle plan. This is the knob that
    stops stale state from leaking across quiet periods (a price quote
    from last month is not "the prevailing price").
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]

    # Tag: right rows sort before left rows at equal ts for inclusive
    # semantics (payload visible to a left row with the same ts); after
    # left rows for strict semantics.
    r_side = 1 if strict else 0
    l_side = 0 if strict else 1

    # The left row rides the union as a struct, so no row id and no
    # join-back are needed: a monotonically_increasing_id-based rowid
    # consumed from two DAG branches could be re-evaluated differently
    # per branch (the function is non-deterministic), silently
    # misaligning carried payloads. This shape is also one operator
    # cheaper — a single shuffle, no broadcast join back.
    payload = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in value_cols])
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        payload.alias("__payload"),
    )
    lrow = F.struct(*[F.col(c) for c in left.columns])
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        lrow.alias("__lrow"),
    )
    r = r.withColumn("__lrow", F.lit(None).cast(l_tagged.schema["__lrow"].dataType))

    unioned = r.unionByName(l_tagged)
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__payload").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward = the same carry in DESCENDING time: the last right row
    # seen before reaching a left row is then the MINIMUM right_ts that
    # is >= the left ts (side ordering keeps equal-ts visibility rules)
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc(), F.col("__payload").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "backward":
        carried = unioned.withColumn(
            "__carry", F.last("__payload", ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        carried = unioned.withColumn(
            "__carry", F.last("__payload", ignorenulls=True).over(w_fwd)
        )
    else:  # nearest
        b = F.last("__payload", ignorenulls=True).over(w_back)
        f = F.last("__payload", ignorenulls=True).over(w_fwd)
        carried = unioned.withColumn("__b", b).withColumn("__f", f)
        # Type-agnostic time distance: subtraction yields a day-time
        # interval for TIMESTAMP *and* TIMESTAMP_NTZ (where a cast to
        # BIGINT is an AnalysisException) and a plain number for numeric
        # ts columns; both compare correctly with <=.
        d_b = F.col("__ts") - F.col("__b.__rts")
        d_f = F.col("__f.__rts") - F.col("__ts")
        carried = carried.withColumn(
            "__carry",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(d_b <= d_f, F.col("__b"))
            .otherwise(F.col("__f")),
        )
    carried = carried.where(F.col("__lrow").isNotNull())
    if tolerance is not None:
        from pyspark.sql import Column as _Column

        tol = tolerance if isinstance(tolerance, _Column) else F.lit(tolerance)
        # |left_ts - matched right_ts| works for every direction and
        # every axis type (greatest(x, -x): interval subtraction covers
        # TIMESTAMP/TIMESTAMP_NTZ, plain arithmetic covers numerics)
        d1 = F.col("__ts") - F.col("__carry.__rts")
        d2 = F.col("__carry.__rts") - F.col("__ts")
        carried = carried.withColumn(
            "__carry",
            F.when(
                F.col("__carry").isNotNull() & (F.greatest(d1, d2) <= tol),
                F.col("__carry"),
            ),
        )

    out_cols = []
    for c in left.columns:
        if c in value_cols:
            out_cols.append(F.col("__carry").getField(c).alias(c))
        else:
            out_cols.append(F.col("__lrow").getField(c).alias(c))
    for c in value_cols:
        if c not in left.columns:
            out_cols.append(F.col("__carry").getField(c).alias(c))
    out_cols.append(F.col("__carry").getField("__rts").alias(f"asof_{right_ts}"))
    return carried.select(*out_cols)
