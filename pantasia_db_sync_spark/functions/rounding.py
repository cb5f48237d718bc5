"""Engine-portable rounding shared by Spark plans and DuckDB oracles.

Plain ROUND(x, n) disagrees between Spark and DuckDB at half-boundaries
(Spark rounds the exact binary expansion via BigDecimal; DuckDB rounds
the scaled double). ``floor(x·10ⁿ + 0.5) / 10ⁿ`` is the same IEEE op
sequence in both engines, so results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column, n: int) -> Column:
    p = 10**n
    return F.floor(col * p + F.lit(0.5)) / F.lit(p)


def sql_round(expr: str, n: int) -> str:
    """DuckDB twin of :func:`fround` (embed in oracle SQL strings)."""
    p = 10**n
    return f"floor(({expr}) * {p} + 0.5) / {p}"
