"""Engine-surface extras: pivot, ranking suite, datetime scalar
functions, exact percentiles, array aggregation.

None of these occur in the reference (its only SQL surface is the five
embedded queries — SURVEY.md §2); they complete the analytics surface a
user of a general engine expects, each with a DuckDB oracle. All are
Catalyst built-ins: single-shuffle aggregations/windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import fround, register


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           floor(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) * 100 + 0.5)
             / 100 AS qty_f,
           floor(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) * 100 + 0.5)
             / 100 AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per l_linestatus value. Values are pinned so
    the plan is a single-pass conditional aggregation (no extra job to
    discover the domain) — the 100 TB-safe pivot shape."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_returnflag",
        fround(F.col("F"), 2).alias("qty_f"),
        fround(F.col("O"), 2).alias("qty_o"),
    )


@register(
    "window_ranking_suite",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(rank()         OVER w AS BIGINT) AS rnk,
           CAST(dense_rank()   OVER w AS BIGINT) AS drnk,
           floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS prnk,
           CAST(ntile(4)       OVER w AS INTEGER) AS quartile,
           floor(cume_dist()   OVER w * 10000 + 0.5) / 10000 AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def window_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function suite in one window pass (one shuffle on the
    partition key; deterministic total order for cross-engine parity)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        fround(F.percent_rank().over(w), 4).alias("prnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        fround(F.cume_dist().over(w), 4).alias("cdist"),
    )


@register(
    "func_datetime",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
           CAST(extract(year FROM ts) AS INTEGER) AS yr,
           CAST(extract(dow FROM ts) AS INTEGER) AS dow,
           CAST(extract(hour FROM ts) AS INTEGER) AS hr,
           ts + INTERVAL 90 MINUTE AS ts_plus,
           CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS INTEGER)
             AS days_since
    FROM events WHERE event_id < 1000
    """,
)
def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar surface: trunc/extract/interval/diff (all
    codegen'd built-ins; DuckDB dow == Spark dayofweek - 1)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        F.date_trunc("month", "ts").alias("month_start"),
        F.year("ts").alias("yr"),
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hr"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus"),
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("days_since"),
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100 AS p50,
           floor(quantile_cont(l_extendedprice, 0.95) * 100 + 0.5) / 100 AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). The scale path is `approx_percentile` (t-digest,
    mergeable, one pass) — kept exact here for the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        fround(F.percentile("l_extendedprice", F.lit(0.5)), 2).alias("p50"),
        fround(F.percentile("l_extendedprice", F.lit(0.95)), 2).alias("p95"),
    )


@register(
    "agg_array_collect",
    oracle="""
    SELECT c_mktsegment,
           list_sort(list(DISTINCT c_nationkey)) AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_set sorted for deterministic
    cross-engine comparison (arrays as first-class column values)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.sort_array(F.collect_set("c_nationkey")).alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "join_salted_skew",
    oracle="""
    WITH d AS (
      SELECT l_returnflag, avg(l_extendedprice) AS flag_avg
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n_above
    FROM lineitem l JOIN d USING (l_returnflag)
    WHERE l.l_extendedprice > d.flag_avg
    GROUP BY 1
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join (operators/skew.py): the join key has only 3 values —
    the worst-case hot-key shape — so the probe side is scattered across
    8 salt buckets and the 3-row build side replicated 8×. Result is
    row-identical to the plain join the oracle runs."""
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = li.groupBy("l_returnflag").agg(F.avg("l_extendedprice").alias("flag_avg"))
    joined = salted_join(
        li, dim, on=["l_returnflag"], scatter_col="l_orderkey", salt_parts=8
    )
    return (
        joined.where(F.col("l_extendedprice") > F.col("flag_avg"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (partial-aggregate-friendly: Catalyst
    expands to one Expand + single shuffle, not one job per set)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
        FROM gs_lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "window_sessionize",
    oracle="""
    WITH x AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
      FROM x
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, sid
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows in batch mode (`F.session_window`, 30-min gap):
    Spark's session end = last event + gap, mirrored by the oracle's
    gaps-and-islands form. One shuffle on the session key."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "window_sliding_agg",
    oracle="""
    WITH b AS (SELECT ts, value, u.i AS k FROM events, UNNEST([0, 1]) AS u(i)),
    w AS (
      SELECT value,
             CAST(TIMESTAMP '1970-01-01 00:00:00'
                  + to_seconds(CAST((floor(epoch(ts) / 3600) - k) * 3600 AS BIGINT))
                  AS TIMESTAMP) AS period_start
      FROM b
    )
    SELECT period_start, CAST(count(*) AS BIGINT) AS n_events,
           floor(sum(value) * 100 + 0.5) / 100 AS total_value
    FROM w GROUP BY 1
    """,
)
def window_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows in batch mode (120-min window, 60-min slide —
    every event lands in exactly 2 epoch-aligned buckets, which is what
    the oracle's UNNEST([0,1]) replication builds by hand)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "120 minutes", "60 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fround(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("period_start"), "n_events", "total_value")
    )


@register(
    "agg_approx_quantile",
    oracle="""
    SELECT l_returnflag, true AS p50_within_tol, true AS p95_within_tol,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable one-pass sketch — the 100 TB
    quantile path) hash-checked via its ACCURACY GUARANTEE, the
    agg_approx_distinct pattern: with accuracy=10000 the rank error is
    <= n/10000, so the sketch value must land between the exact
    quantiles at p +/- 1%. Sketch values themselves are engine-specific
    and never compared."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("a95"),
        F.percentile("l_extendedprice", F.lit(0.49)).alias("lo50"),
        F.percentile("l_extendedprice", F.lit(0.51)).alias("hi50"),
        F.percentile("l_extendedprice", F.lit(0.94)).alias("lo95"),
        F.percentile("l_extendedprice", F.lit(0.96)).alias("hi95"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return g.select(
        "l_returnflag",
        ((F.col("a50") >= F.col("lo50")) & (F.col("a50") <= F.col("hi50"))).alias(
            "p50_within_tol"
        ),
        ((F.col("a95") >= F.col("lo95")) & (F.col("a95") <= F.col("hi95"))).alias(
            "p95_within_tol"
        ),
        "n",
    )
