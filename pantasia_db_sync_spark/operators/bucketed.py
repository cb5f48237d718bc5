"""Bucketed co-located joins — shuffle-free fact ⋈ fact.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling BOTH
sides on the join key. If the tables are written bucketed on that key
with the same bucket count (hash-partitioned at write time, Spark's
`bucketBy` + `sortBy`), the join's required distribution is already
satisfied by the storage layout: each task reads bucket i of both
tables and joins locally — ZERO exchange at read time, amortizing one
write-time shuffle across every future join/aggregation on that key.
This is the lakehouse answer to the reference's Postgres btree-indexed
joins (`/root/reference/app/db/postgres.py` schema DDL): the layout,
not the query, pays for co-location.

Mechanics: bucketed writes must go through the catalog
(`saveAsTable`); we register EXTERNAL tables (explicit `path` into a
caller-owned directory) so the data location is under the caller's
control and the catalog entry is just metadata. `sortBy` within
buckets additionally enables sort-merge joins without a per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    replace: bool = False,
) -> None:
    """Write ``df`` as an external bucketed table at ``path``.

    Refuses to clobber an existing catalog entry unless ``replace=True``:
    the session catalog is shared state, and silently DROPping a
    same-named table a user (or a concurrent invocation) created is data
    loss from their point of view. Callers that own the name — e.g. a
    registered query using a per-invocation unique name — opt in
    explicitly."""
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        if not replace:
            raise ValueError(
                f"catalog table {table!r} already exists; pass replace=True "
                "to overwrite, or use a unique (e.g. uuid-suffixed) name"
            )
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.option("path", path).mode("overwrite").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_left: str,
    key_right: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys. With
    matching bucket counts Spark's EnsureRequirements sees both sides
    already hash-distributed on the key and plans the join with no
    ShuffleExchange on either side (assert via `assert_no_shuffle`)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_left] == rt[key_right], how)


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
