"""Registry pairing each PySpark query with its DuckDB oracle SQL.

Contract (driver, ``__spark_entry__.py``): the Spark callable and the
oracle SQL must produce identical row counts, column names, and
order-insensitive values at sf=0.01. Queries whose semantics are not
ANSI-SQL-expressible (streaming state, approximate sketches) register
with ``oracle=None`` and get the driver's weaker rows-only check.

Cross-engine parity rules encoded here once so every query obeys them:
- alias every computed column identically on both sides;
- ``ROUND(x, n)`` any float aggregate on both sides (summation order
  differs between engines in the last ulps);
- cast DuckDB integer sums to BIGINT (DuckDB ``sum(int)`` → HUGEINT,
  Spark → LongType);
- deterministic tie-breaks on every top-k / offset query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import fround, sql_round  # noqa: F401  (re-export)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle.

    Guards against the decorator-stacking bug class that shipped in round 9
    (commit 58844c6): an ``@register`` line separated from its intended
    ``def`` silently binds the key to the *neighboring* function.  Neither
    name collides, so the duplicate-key check never fires.  Two structural
    assertions close that hole:

    1. the decorated function must not already be registered under another
       key (one function object == one query), and
    2. ``fn.__name__`` must match the repo-wide convention — ``name`` or
       ``name + "_q"`` — so a decorator that drifted onto a neighbor fails
       loudly at import time instead of at oracle-sweep time.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        for other, existing in QUERIES.items():
            if existing is fn:
                raise ValueError(
                    f"function {fn.__name__!r} already registered as {other!r}; "
                    f"refusing to also bind it to {name!r} (decorator likely "
                    "attached to the wrong def)"
                )
        if fn.__name__ not in (name, name + "_q"):
            raise ValueError(
                f"register({name!r}) decorates {fn.__name__!r}: function name "
                f"must be {name!r} or '{name}_q' (decorator likely attached "
                "to the wrong def)"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def local_result(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Re-wrap already-collected result rows as a DataFrame with a
    partition count sized to the DATA, not to defaultParallelism.

    The tempdir-backed queries (store_*, ann_ivf_index_topk, ...) must
    materialize before their fixture dir vanishes and hand back a
    local-relation frame. ``spark.createDataFrame(rows)`` parallelizes
    to defaultParallelism slices — on local[32] every downstream
    materialization of a 12-row result runs a 32-task job (31 empty);
    measured ~0.4 s of pure task-launch overhead per noop sink vs a
    born-single-partition frame. Slices scale with the row count
    (results are driver-resident by construction, so 64k rows/slice
    keeps tasks meaningful at any plausible result size)."""
    slices = max(1, min(spark.sparkContext.defaultParallelism, len(rows) // 65536 + 1))
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, slices), schema)
