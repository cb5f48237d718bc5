"""Referential-integrity validation over the target store.

The reference delegates FK enforcement to Postgres constraints
(``pantasia_create_fk``, /root/reference/app/db/postgres.py:214-244);
a parquet store has no engine-enforced constraints, so this module
re-expresses each FK as a distributed anti-join: child rows with a
non-NULL FK value that have no matching parent row are violations.

Anti-joins are the Spark-native constraint check — one hash join per
FK, broadcast when the parent dim is small, no driver-side state. At
100 TB the fact-side scans dominate and each check is a single
pushed-down column scan + join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import FACT_TABLES, FOREIGN_KEYS
from .store import TableStore


def fk_violations(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Child rows whose non-NULL ``child_col`` matches no parent row."""
    return child.where(F.col(child_col).isNotNull()).join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )


def validate_foreign_keys(
    spark: SparkSession, store: TableStore
) -> dict[tuple[str, str], int]:
    """Violation counts per (child_table, child_column) FK edge.

    Missing tables are skipped (a store mid-bootstrap has no facts
    yet); a fully-synced store must report 0 for every edge.
    """

    def load(table: str) -> DataFrame | None:
        if table in FACT_TABLES:
            return store.read_facts(spark, table)
        return store.read(spark, table)

    frames: dict[str, DataFrame | None] = {}
    out: dict[tuple[str, str], int] = {}
    for child_t, child_c, parent_t, parent_c in FOREIGN_KEYS:
        for t in (child_t, parent_t):
            if t not in frames:
                frames[t] = load(t)
        child, parent = frames[child_t], frames[parent_t]
        if child is None or parent is None:
            continue
        out[(child_t, child_c)] = fk_violations(
            child, child_c, parent, parent_c
        ).count()
    return out
