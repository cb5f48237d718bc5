"""JDBC source/sink factory — the production stand-in for the catalog.

The reference connects to two Postgres databases with psycopg2 and
ships SQL strings over the socket (``/root/reference/app/db/
postgres.py:16-60``); the Spark-native equivalent is the JDBC data
source with *partitioned reads*, so a 1000-executor cluster scans the
source table in parallel instead of through one connection.

Untested here (no database in the container); the parquet catalog
(`sources/catalog.py`) is the tested path and the query plans above
either source are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
    dbtable = table if predicate is None else f"(SELECT * FROM {table} WHERE {predicate}) src"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
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
