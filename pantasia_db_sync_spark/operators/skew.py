"""Salted join — the manual skew-mitigation pattern.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime, but it only splits *sort-merge* partitions; a medium-sized
build side that is too big to broadcast yet joined on a low-cardinality
/ hot key still funnels hot keys into single tasks. Salting fixes the
partitioning by construction: the probe side scatters each hot key
across ``salt_parts`` sub-keys (deterministic hash of a per-row column,
so replays are stable), and the build side is replicated once per salt
value. Result is row-identical to the plain join.

Cost model: build side is duplicated ``salt_parts``× (shuffle volume),
probe side is untouched — choose ``salt_parts`` ≈ (hot-key rows /
target-partition rows). Worth it only when key skew dominates; for
broadcast-sized build sides, broadcast instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    scatter_col: str,
    how: str = "inner",
    salt_parts: int = 8,
) -> DataFrame:
    """Join ``probe ⋈ build ON on`` with the probe's hot keys scattered.

    ``scatter_col``: any probe column with high cardinality within a
    join key (a row id, tx hash...) — hashed to pick the salt bucket
    deterministically (no rand(): idempotent replays, G5).
    """
    p = probe.withColumn(
        SALT_COL, F.pmod(F.crc32(F.col(scatter_col).cast("string")), F.lit(salt_parts))
    )
    b = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_parts - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast(p.schema[SALT_COL].dataType))
    return p.join(b, [*on, SALT_COL], how).drop(SALT_COL)
