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
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
