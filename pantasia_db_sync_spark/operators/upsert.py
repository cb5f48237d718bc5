"""Dimension upsert split: which incoming natural keys are new?

Replaces the reference's ``IdIndex`` dict-membership test
(``/root/reference/app/db/id_index.py:27-73`` probed at
``app/main.py:117-189``): in Spark the "index" IS the dimension table,
the probe IS a broadcast left-anti join, and cross-batch dedup is
``dropDuplicates`` within the batch. No driver RAM, no per-key
round-trips, and the same idempotence guarantee (re-running a batch
finds all keys already present → empty new-rows frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_dimension_rows(
    batch: DataFrame,
    dim: DataFrame,
    natural_key: list[str] | str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Distinct batch rows whose natural key is absent from ``dim``.

    ``dim`` is broadcast by default — pantasia's dimensions (wallet /
    collection / asset) are small relative to the fact stream. For a
    dimension too large to broadcast, pass ``broadcast_dim=False`` to
    get a shuffled anti join (AQE will still pick broadcast if the
    runtime size allows).
    """
    keys = [natural_key] if isinstance(natural_key, str) else list(natural_key)
    deduped = batch.dropDuplicates(keys)
    right = F.broadcast(dim.select(*keys)) if broadcast_dim else dim.select(*keys)
    return deduped.join(right, on=keys, how="left_anti")
