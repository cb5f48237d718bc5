"""SparkSession builder tuned for the engine.

The reference daemon hand-tunes its working set (120-minute periods,
in-memory key index — ``/root/reference/app/settings.py:8-9``); here the
equivalent knobs are Spark confs chosen for a large cluster and scaled
down by environment variables for local runs:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  replaces the reference's reliance on the Postgres planner.
- Broadcast threshold raised: every pantasia dimension table (wallet /
  collection / asset) is broadcast-sized relative to the fact stream.
- UTC session timezone: the reference stores timezone-naive UTC
  timestamps (``app/db/postgres.py:100-102``); parity with the DuckDB
  oracle requires a fixed zone.
- Arrow enabled: all Python-side paths are vectorized pandas UDFs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "pantasia-db-sync-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Local defaults come from ``SPARK_GRAFT_CPUS`` (driver contract); on a
    real cluster, pass ``master=None`` with spark-submit supplying it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: runtime join selection, skew handling ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # dimension tables (nation/region/customer ≈ wallet/collection dims)
        # are broadcast-sized; 64m covers them at any realistic dim growth
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- python interchange is Arrow-batched everywhere ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing: 128m splits hold at 100 TB (≈800k tasks, fine
        # for a 1000-executor cluster with dynamic allocation) ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # fixture parquet carries TIMESTAMP(NANOS) (pandas default);
        # read as int64 nanos, catalog.load_table converts to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Deployment-specific conf overrides without a code edit (the same
    # escape hatch spark-submit --conf provides on a cluster): a
    # semicolon-separated k=v list, e.g.
    #   SPARK_GRAFT_EXTRA_CONF="spark.io.compression.codec=zstd"
    # Applied before the caller's extra_conf so explicit call-site
    # overrides still win. Empty/unset = byte-identical defaults.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for item in filter(None, (s.strip() for s in env_conf.split(";"))):
        k, _, v = item.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
