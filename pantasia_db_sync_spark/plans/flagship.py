"""Flagship query — the reference's main extraction query, Spark-first.

The reference's single big SQL (``pantasia_get_records``,
/root/reference/app/db/postgres.py:327-402) is:

    (mint leg: ma_tx_mint ⋈ tx ⋈ block ⋈ multi_asset, burns filtered)
    UNION ALL
    (output leg: ma_tx_out ⋈ tx_out ⋈ tx ⋈ block ⋈ multi_asset ⟕ stake_address)
    ⟕ LATERAL (CIP-25 metadata subquery, tm.key = 721)
    WHERE time in (lo, hi]  ORDER BY time ASC

Transposed onto the fixture star schema: lineitem plays ``ma_tx_out``
(transfers), error-events play ``ma_tx_mint`` (burns), part plays
``multi_asset`` (broadcast), customer plays ``stake_address``
(broadcast, left), and signup-event props play the lateral CIP-25
metadata (decorrelated: pre-aggregate → broadcast left join →
coalesced ``is_mint_tx``-style flag). Exercises B1-B9, C1-C9, E1, F1
in one Catalyst plan; each leg keeps its own filters so pushdown
reaches both parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

FLAGSHIP_ORACLE = """
WITH meta AS (
  SELECT user_id, props AS metadata,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS meta_k
  FROM (
    SELECT user_id, props, ts, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type = 'signup'
  ) WHERE rn = 1
),
out_leg AS (
  SELECT 'OUT' AS leg,
         l.l_partkey AS asset_id,
         p.p_name AS asset_name,
         concat_ws('.', p.p_brand, p.p_type) AS asset_hash,
         o.o_custkey AS wallet_key,
         c.c_name AS address,
         l.l_quantity AS qty,
         l.l_shipdate AS ts,
         lower(hex(CAST(l.l_orderkey AS VARCHAR))) AS tx_hash,
         FALSE AS is_mint
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE l.l_shipdate > TIMESTAMP '1992-01-01 00:00:00'
    AND l.l_shipdate <= TIMESTAMP '2030-01-01 00:00:00'
),
mint_leg AS (
  SELECT 'MINT' AS leg,
         CAST(e.event_id % 1000 AS BIGINT) AS asset_id,
         p.p_name AS asset_name,
         concat_ws('.', p.p_brand, p.p_type) AS asset_hash,
         e.user_id AS wallet_key,
         CAST(NULL AS VARCHAR) AS address,
         -e.value AS qty,
         e.ts AS ts,
         lower(hex(CAST(e.event_id AS VARCHAR))) AS tx_hash,
         TRUE AS is_mint
  FROM events e
  JOIN part p ON (e.event_id % 1000) = p.p_partkey
  WHERE e.event_type = 'error'
    AND e.ts > TIMESTAMP '1992-01-01 00:00:00'
    AND e.ts <= TIMESTAMP '2030-01-01 00:00:00'
)
SELECT u.leg, u.asset_id, u.asset_name, u.asset_hash, u.wallet_key, u.address,
       u.qty, u.ts, u.tx_hash, u.is_mint,
       m.metadata, m.meta_k,
       m.user_id IS NOT NULL AS has_meta
FROM (SELECT * FROM out_leg UNION ALL SELECT * FROM mint_leg) u
LEFT JOIN meta m ON u.wallet_key = m.user_id
"""


def flagship_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1992-01-01").cast("timestamp")
    hi = F.lit("2030-01-01").cast("timestamp")

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")

    # Decorrelated lateral metadata (C8): latest signup props per user.
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    meta = (
        e.where(F.col("event_type") == "signup")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("props").alias("metadata"),
            F.get_json_object("props", "$.k").try_cast("int").alias("meta_k"),
        )
    )

    out_leg = (
        li.where((F.col("l_shipdate") > lo) & (F.col("l_shipdate") <= hi))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .select(
            F.lit("OUT").alias("leg"),
            F.col("l_partkey").alias("asset_id"),
            F.col("p_name").alias("asset_name"),
            F.concat_ws(".", "p_brand", "p_type").alias("asset_hash"),
            F.col("o_custkey").alias("wallet_key"),
            F.col("c_name").alias("address"),
            F.col("l_quantity").alias("qty"),
            F.col("l_shipdate").alias("ts"),
            F.lower(F.hex(F.col("l_orderkey").cast("string"))).alias("tx_hash"),
            F.lit(False).alias("is_mint"),
        )
    )

    mint_leg = (
        e.where(
            (F.col("event_type") == "error") & (F.col("ts") > lo) & (F.col("ts") <= hi)
        )
        .withColumn("asset_id", (F.col("event_id") % 1000).cast("bigint"))
        .join(F.broadcast(p), F.col("asset_id") == p.p_partkey)
        .select(
            F.lit("MINT").alias("leg"),
            F.col("asset_id"),
            F.col("p_name").alias("asset_name"),
            F.concat_ws(".", "p_brand", "p_type").alias("asset_hash"),
            F.col("user_id").alias("wallet_key"),
            F.lit(None).cast("string").alias("address"),
            (-F.col("value")).alias("qty"),
            F.col("ts"),
            F.lower(F.hex(F.col("event_id").cast("string"))).alias("tx_hash"),
            F.lit(True).alias("is_mint"),
        )
    )

    unioned = out_leg.unionByName(mint_leg)
    return unioned.join(F.broadcast(meta), unioned.wallet_key == meta.user_id, "left").select(
        "leg",
        "asset_id",
        "asset_name",
        "asset_hash",
        "wallet_key",
        "address",
        "qty",
        "ts",
        "tx_hash",
        "is_mint",
        "metadata",
        "meta_k",
        F.col("user_id").isNotNull().alias("has_meta"),
    )


@register("flagship_extraction", oracle=FLAGSHIP_ORACLE)
def flagship_extraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship_frame(spark, sf_dir)
