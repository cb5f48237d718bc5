"""JDBC source/sink factory — the production stand-in for the catalog.

The reference connects to two Postgres databases with psycopg2 and
ships SQL strings over the socket (``/root/reference/app/db/
postgres.py:16-60``); the Spark-native equivalent is the JDBC data
source with *partitioned reads*, so a 1000-executor cluster scans the
source table in parallel instead of through one connection.

The option/predicate construction is pure logic and unit-tested
without a server (tests/test_jdbc.py); only the final ``.load()`` /
``.save()`` needs a live database, and the query plans above either
source are identical to the parquet catalog path
(`sources/catalog.py`).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession


def period_predicate(ts_col: str, lo: datetime, hi: datetime) -> str:
    """The reference's per-period half-open time filter
    (``app/db/postgres.py:347-349``: ``b3.time > %s AND b3.time <= %s``)
    as a pushdown-able SQL predicate. Full microsecond precision: the
    sink tip is max(tx_time), and truncating fractional seconds would
    re-read (and duplicate) rows in the truncated interval."""
    return (
        f"{ts_col} > TIMESTAMP '{lo:%Y-%m-%d %H:%M:%S.%f}' "
        f"AND {ts_col} <= TIMESTAMP '{hi:%Y-%m-%d %H:%M:%S.%f}'"
    )


def jdbc_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    predicate: str | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """The full option map for a (possibly partitioned) JDBC read.

    `predicate` is pushed into every partition's WHERE clause via a
    dbtable subquery; `partition_column`+bounds make Spark generate
    `num_partitions` stride ranges server-side.
    """
    dbtable = (
        table
        if predicate is None
        else f"(SELECT * FROM {table} WHERE {predicate}) src"
    )
    opts = {
        "url": url,
        "dbtable": dbtable,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        if upper_bound <= lower_bound:
            raise ValueError("upper_bound must be > lower_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def stride_predicates(
    column: str, lower_bound: int, upper_bound: int, num_partitions: int
) -> list[str]:
    """Mutually-exclusive, collectively-exhaustive WHERE clauses — one
    per partition — with the same semantics Spark's JDBCRelation uses:
    values below the lower bound (and NULLs) land in the first
    partition, values at-or-above the upper bound in the last, so no
    source row is ever dropped by partitioning. For use with
    ``spark.read.jdbc(url, table, predicates=...)`` when a stride
    column exists but bounds-based splitting needs custom clauses.
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if upper_bound <= lower_bound:
        raise ValueError("upper_bound must be > lower_bound")
    if num_partitions == 1:
        return ["1=1"]
    stride = (upper_bound - lower_bound) // num_partitions or 1
    preds = []
    bound = lower_bound
    for i in range(num_partitions):
        lo, hi = bound, bound + stride
        if i == 0:
            preds.append(f"{column} < {hi} OR {column} IS NULL")
        elif i == num_partitions - 1:
            preds.append(f"{column} >= {lo}")
        else:
            preds.append(f"{column} >= {lo} AND {column} < {hi}")
        bound = hi
    return preds


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    predicate: str | None = None,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Range-partitioned parallel scan of one source table.

    `partition_column`/bounds split the scan into `num_partitions`
    stride-ranges (the distributed form of the reference's single
    ``pantasia_get_records`` cursor); `predicate` is pushed into every
    partition's WHERE clause, like the reference's per-period time
    filter (``app/db/postgres.py:347-349``).
    """
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(
        url,
        table,
        partition_column=partition_column,
        num_partitions=num_partitions,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        predicate=predicate,
        fetch_size=fetch_size,
    ).items():
        reader = reader.option(k, v)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Bulk batched insert — the reference's multi-row VALUES writers
    (``app/db/postgres.py:404-469``) become executor-parallel batched
    statements (`batchsize` rows per round-trip per partition)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
