"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic ledger, partition-parallel, with row_id
filter pushdown that PRUNES partitions inside the source.

Why this exists: the reference's only sources are two psycopg2
connections (/root/reference/app/db/postgres.py:16-60). The modern
Spark answer to "my data lives behind an API/generator, not a file
format" is a first-class Python data source: Spark plans it like any
table — column pruning, filter pushdown (Spark 4.1 `pushFilters`),
one task per `InputPartition` — while the row production stays plain
Python. At 100 TB the things that matter are (a) partitions() carving
the key space so every executor pulls its own slice (no driver
funnel), and (b) pushed range filters shrinking the slice BEFORE rows
are generated/fetched, which for a real backing store is the
difference between a full scan and an index range read.

Everything generated is pure integer arithmetic on ``row_id``, so a
DuckDB oracle reproduces the source exactly from ``range()``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "row_id bigint, account int, ts_sec bigint, amount double"


def ledger_row(rid: int) -> tuple:
    """The row for ``row_id`` — shared by the reader and the tests;
    mirrored verbatim by the SQL oracle (ledger_sql_exprs)."""
    return (
        rid,
        int((rid * 2654435761) % 997),
        int(879_000_000 + rid),
        ((rid * 1103515245 + 12345) % 1_000_000) / 100.0,
    )


LEDGER_SQL_EXPRS = (
    "CAST(i AS BIGINT) AS row_id",
    "CAST((i * 2654435761) % 997 AS INTEGER) AS account",
    "CAST(879000000 + i AS BIGINT) AS ts_sec",
    "((i * 1103515245 + 12345) % 1000000) / 100.0 AS amount",
)


@dataclass(frozen=True)
class LedgerPartition(InputPartition):
    start: int
    end: int


class LedgerReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 100_000))
        self.n_parts = int(options.get("parts", 8))
        self.lo, self.hi = 0, self.n_rows

    def pushFilters(self, filters):
        """Accept range predicates on row_id by shrinking [lo, hi);
        everything else is returned for Spark to evaluate post-scan.
        Accepted filters also stay post-evaluated only if re-yielded —
        we fully honor these, so they are consumed."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("row_id",):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f

    def partitions(self):
        """Carve the (possibly filter-shrunk) range into equal slices —
        empty slices are simply not emitted, so a pushed range prunes
        whole TASKS, not just rows."""
        lo, hi = self.lo, self.hi
        if hi <= lo:
            return [LedgerPartition(0, 0)]
        step = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        parts = []
        for s in range(0, self.n_rows, step):
            a, b = max(lo, s), min(hi, s + step)
            if a < b:
                parts.append(LedgerPartition(a, b))
        return parts or [LedgerPartition(0, 0)]

    def read(self, partition: LedgerPartition):
        for rid in range(partition.start, partition.end):
            yield ledger_row(rid)


class LedgerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ledger"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> LedgerReader:
        return LedgerReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "LedgerStreamReader":
        return LedgerStreamReader(self.options)


def register_ledger_source(spark) -> None:
    # Spark refuses a reader that implements pushFilters() unless the
    # (default-off in 4.1) Python-source pushdown flag is on. Scoped
    # safely: the flag only affects Python data sources that implement
    # pushFilters — i.e., only this one.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LedgerDataSource)


class LedgerStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic ledger: offsets
    are plain ``{"row": n}`` dicts, each batch advances by
    ``batch_rows`` until ``rows`` is exhausted, then reads return empty
    with an unmoved offset (a quiesced source). ``readBetweenOffsets``
    regenerates any committed range deterministically — the replay
    contract that gives exactly-once downstream (a re-delivered batch
    is bit-identical, so idempotent sinks dedupe naturally, same
    property the TableStore commit protocol relies on)."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 100_000))
        self.batch_rows = int(options.get("batch_rows", 1_000))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        # iter(list), not a generator and not a bare list: Spark's
        # prefetch cache copy.copy()s the returned iterator when
        # serving planInputPartitions (generators are not copyable),
        # AND calls next() on it to validate an offset that did not
        # advance (a bare list fails there with "'list' object is not
        # an iterator" once the ledger quiesces). A list_iterator
        # supports both.
        lo = int(start["row"])
        hi = min(lo + self.batch_rows, self.n_rows)
        return iter([ledger_row(rid) for rid in range(lo, hi)]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [ledger_row(rid) for rid in range(int(start["row"]), int(end["row"]))]
        )


