"""Argmax-per-key "latest state" operator.

The reference tracks current owner / latest tx per asset by replaying
rows in time order and letting later rows overwrite earlier ones
(``/root/reference/app/main.py:226-248,290-315``, correct only because
of the global ``ORDER BY b3.time asc`` at ``app/db/postgres.py:394``).
The Spark-native equivalent needs no global sort: a per-key window
ranks rows by the ordering columns and keeps rank 1. One shuffle on the
key; with AQE, skewed keys split automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_state(
    df: DataFrame,
    keys: list[str] | str,
    order_by: list[str | Column],
    keep: list[str] | None = None,
) -> DataFrame:
    """One row per key: the row ranked first by ``order_by`` (descending
    for plain string columns; pass explicit Column expressions to
    control direction/tie-breaks).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_exprs = [F.col(c).desc() if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    ranked = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    if keep is not None:
        ranked = ranked.select(*keys, *keep)
    return ranked
