"""Pipeline-shaped operators: the sync daemon's building blocks, each as
an oracle-checked query over the fixture tables.

These are the Spark forms of the reference's procedural dataflow
(SURVEY.md §2.D/§2.G): dimension upsert with surrogate keys, argmax
latest-state updates, tip/high-watermark probes, period chunking, and
replay idempotence. The full wired pipeline (cardano-shaped schema)
lives in pipeline/sync.py with its own end-to-end golden tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import latest_state, new_dimension_rows, with_dense_ids
from ..sources.catalog import load_table
from .registry import fround, local_result, register


@register(
    "dim_upsert_new_keys",
    oracle="""
    WITH existing AS (SELECT DISTINCT p_type FROM part WHERE p_partkey < 100),
    newk AS (
      SELECT DISTINCT p_type FROM part
      WHERE p_type NOT IN (SELECT p_type FROM existing)
    )
    SELECT p_type AS type_name,
           CAST(row_number() OVER (ORDER BY p_type)
                + (SELECT count(*) FROM existing) AS BIGINT) AS id
    FROM newk
    """,
)
def dim_upsert_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2+D4 — the IdIndex replacement end-to-end: batch dedup →
    broadcast left-anti against the existing dimension → dense surrogate
    ids seeded from the stored max (app/main.py:124-138,33-38). The
    existing-dim row count is a metadata-scale driver action, exactly
    like the reference's A5 max-id probe."""
    part = load_table(spark, sf_dir, "part")
    existing = part.where(F.col("p_partkey") < 100).select("p_type").distinct()
    batch = part.select("p_type")
    new = new_dimension_rows(batch, existing, "p_type")
    seed = existing.count()
    out = with_dense_ids(new, ["p_type"], id_col="id", start=seed + 1)
    return out.select(F.col("p_type").alias("type_name"), "id")


@register(
    "latest_owner_update",
    oracle="""
    SELECT l_partkey AS asset_id, o_custkey AS current_wallet_id, l_shipdate AS last_ts
    FROM (
      SELECT l.l_partkey, o.o_custkey, l.l_shipdate,
             row_number() OVER (PARTITION BY l.l_partkey
                                ORDER BY l.l_shipdate DESC, l.l_orderkey DESC,
                                         l.l_linenumber DESC) AS rn
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ) WHERE rn = 1
    """,
)
def latest_owner_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — `asset.current_wallet_id` derivation (app/main.py:290-294):
    argmax by event time per asset instead of ordered-replay overwrite."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    facts = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_partkey", "o_custkey", "l_shipdate", "l_orderkey", "l_linenumber"
    )
    out = latest_state(
        facts,
        keys="l_partkey",
        order_by=[
            F.col("l_shipdate").desc(),
            F.col("l_orderkey").desc(),
            F.col("l_linenumber").desc(),
        ],
    )
    return out.select(
        F.col("l_partkey").alias("asset_id"),
        F.col("o_custkey").alias("current_wallet_id"),
        F.col("l_shipdate").alias("last_ts"),
    )


@register(
    "asset_ext_latest",
    oracle="""
    WITH tx AS (
      SELECT l_partkey AS asset_id,
             CAST(l_orderkey * 100 + l_linenumber AS BIGINT) AS latest_tx_id
      FROM (
        SELECT l_partkey, l_orderkey, l_linenumber,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY l_shipdate DESC, l_orderkey DESC,
                                           l_linenumber DESC) AS rn
        FROM lineitem
      ) WHERE rn = 1
    ),
    mint AS (
      SELECT asset_id, event_id AS latest_mint_tx_id
      FROM (
        SELECT CAST(event_id % 1000 AS BIGINT) AS asset_id, event_id, ts,
               row_number() OVER (PARTITION BY CAST(event_id % 1000 AS BIGINT)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'error'
      ) WHERE rn = 1
    )
    SELECT tx.asset_id, tx.latest_tx_id, mint.latest_mint_tx_id
    FROM tx LEFT JOIN mint ON tx.asset_id = mint.asset_id
    """,
)
def asset_ext_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3/A7 — the `asset_ext(latest_tx_id, latest_mint_tx_id)` update
    batch (app/main.py:226-248,296-315): two per-key argmaxes merged."""
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")
    tx = latest_state(
        li,
        keys="l_partkey",
        order_by=[
            F.col("l_shipdate").desc(),
            F.col("l_orderkey").desc(),
            F.col("l_linenumber").desc(),
        ],
    ).select(
        F.col("l_partkey").alias("asset_id"),
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).cast("bigint").alias("latest_tx_id"),
    )
    mint_src = e.where(F.col("event_type") == "error").withColumn(
        "asset_id", (F.col("event_id") % 1000).cast("bigint")
    )
    mint = latest_state(
        mint_src,
        keys="asset_id",
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    ).select("asset_id", F.col("event_id").alias("latest_mint_tx_id"))
    return tx.join(mint, "asset_id", "left").select(
        "asset_id", "latest_tx_id", "latest_mint_tx_id"
    )


@register(
    "sink_tip",
    oracle="""
    SELECT greatest(
      (SELECT max(l_shipdate) FROM lineitem),
      (SELECT max(ts) FROM events)
    ) AS tip
    """,
)
def sink_tip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1/E2 — sink tip = max event time over both fact tables, the
    union-of-two-tips-then-max probe (app/db/postgres.py:280-312)."""
    li = load_table(spark, sf_dir, "lineitem").agg(F.max("l_shipdate").alias("tip"))
    e = load_table(spark, sf_dir, "events").agg(F.max("ts").alias("tip"))
    return li.unionByName(e).agg(F.max("tip").alias("tip"))


@register(
    "store_branch_read",
    oracle="""
    SELECT 'branch' AS side,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)
    UNION ALL
    SELECT 'source',
           CAST(count(*) AS BIGINT),
           CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 4 IN (0, 1, 3)
    """,
)
def store_branch_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10-ext — zero-copy BRANCH round trip through a real TableStore
    (pipeline/store.py::create_branch): two shared commits land, the
    branch is created (metadata only — nothing copied), then branch and
    source each append a divergent commit under the SAME commit id.
    The branch must read shared + its own rows, the source shared +
    its own — the isolation the oracle replays as plain key-mod set
    algebra over orders. Exercises the branch-aware commit-dir
    resolution end-to-end at driver-check scale."""
    import shutil
    import tempfile

    from ..pipeline.store import TableStore

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    part = F.pmod(F.col("o_orderkey"), 4)
    d = tempfile.mkdtemp(prefix="branch_store_")
    try:
        store = TableStore(d)
        store.append("orders_f", o.where(part == 0), commit_id=1)
        store.commit_append("orders_f", 1)
        store.append("orders_f", o.where(part == 1), commit_id=2)
        store.commit_append("orders_f", 2)
        store.create_branch("orders_f", "orders_dev")
        store.append("orders_dev", o.where(part == 2), commit_id=3)
        store.commit_append("orders_dev", 3)
        store.append("orders_f", o.where(part == 3), commit_id=3)
        store.commit_append("orders_f", 3)

        def agg(table: str, side: str) -> DataFrame:
            return store.read_facts(spark, table).agg(
                F.lit(side).alias("side"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            ).select("side", "n", "key_sum")

        out = agg("orders_dev", "branch").unionByName(agg("orders_f", "source"))
        # materialize before the store dir disappears (the driver may
        # collect lazily after this function returns)
        rows = out.collect()
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "store_merge_on_read_delete",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE (o_orderkey % 4 = 0 AND o_orderkey % 8 <> 0)
       OR o_orderkey % 4 IN (1, 2)
    """,
)
def store_merge_on_read_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10-ext — equality-delete round trip through a real TableStore
    (pipeline/store.py::delete_facts): commits 1 and 2 append two key
    classes, commit 3 tombstones the %8==0 keys (killing only their
    commit-1 rows — the Iceberg strictly-below sequence rule) while
    appending a third class in the same commit. The merged read must
    show exactly the oracle's key-mod set algebra."""
    import shutil
    import tempfile

    from ..pipeline.store import TableStore

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    part = F.pmod(F.col("o_orderkey"), 4)
    d = tempfile.mkdtemp(prefix="mor_store_")
    try:
        store = TableStore(d)
        store.append("orders_f", o.where(part == 0), commit_id=1)
        store.commit_append("orders_f", 1)
        store.append("orders_f", o.where(part == 1), commit_id=2)
        store.commit_append("orders_f", 2)
        store.delete_facts(
            "orders_f",
            o.where(F.pmod(F.col("o_orderkey"), 8) == 0),
            commit_id=3,
        )
        store.append("orders_f", o.where(part == 2), commit_id=3)
        store.commit_append("orders_f", 3)
        out = store.read_facts(spark, "orders_f").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "store_delete_where",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_orderkey % 97 AS val FROM orders),
    fin AS (
      SELECT o_orderkey, CAST(val AS BIGINT) AS val FROM base WHERE val >= 30
      UNION ALL
      SELECT o_orderkey, CAST(val + 1000 AS BIGINT) FROM base WHERE val < 10
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(val) AS BIGINT) AS val_sum,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM fin
    """,
)
def store_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10-ext — predicate DELETE + atomic REPLACE WHERE
    (pipeline/store.py::delete_where, the Delta ``DELETE FROM ...
    WHERE`` / ``replaceWhere`` pair on the merge-on-read path): commit
    1 seeds (key, val); commit 2 predicate-deletes ``val < 30`` — ONE
    pruned scan resolves the predicate to equality-delete keys, no
    rewrite — and re-appends the ``val < 10`` slice at val+1000 UNDER
    THE SAME COMMIT, so the strictly-below tombstone rule makes
    delete + re-insert one atomic replace-where. The merged read must
    equal the oracle's set algebra over the final state."""
    import shutil
    import tempfile

    from ..pipeline.store import TableStore

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.pmod(F.col("o_orderkey"), 97).cast("long").alias("val")
    )
    d = tempfile.mkdtemp(prefix="dw_store_")
    try:
        store = TableStore(d)
        store.append("orders_f", o, commit_id=1)
        store.commit_append("orders_f", 1)
        store.delete_where(
            spark, "orders_f", "val < 30", ["o_orderkey"], commit_id=2
        )
        store.append(
            "orders_f",
            o.where(F.col("val") < 10).select(
                "o_orderkey", (F.col("val") + 1000).alias("val")
            ),
            commit_id=2,
        )
        store.commit_append("orders_f", 2)
        out = store.read_facts(spark, "orders_f").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("val").cast("bigint").alias("val_sum"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "store_change_feed",
    oracle="""
    SELECT 'insert' AS change_type, CAST(2 AS BIGINT) AS commit_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey % 4 = 1
    UNION ALL
    SELECT 'insert', 3, CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 4 = 2
    UNION ALL
    SELECT 'delete', 3, CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 8 = 0
    """,
)
def store_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10-ext — incremental change feed (Delta CDF / Iceberg
    incremental scan) through a real TableStore
    (pipeline/store.py::read_facts_changes): after the same commit
    history as store_merge_on_read_delete (seed, seed, delete+append in
    one commit), reading changes since commit 1 must emit exactly the
    commit-2 and commit-3 appends as inserts and the commit-3
    tombstone keys as deletes — each stamped with its commit id, rows
    read O(changed commits), never the table. The oracle replays the
    three change groups as key-mod algebra."""
    import shutil
    import tempfile

    from ..pipeline.store import TableStore

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    part = F.pmod(F.col("o_orderkey"), 4)
    d = tempfile.mkdtemp(prefix="cdf_store_")
    try:
        store = TableStore(d)
        store.append("orders_f", o.where(part == 0), commit_id=1)
        store.commit_append("orders_f", 1)
        store.append("orders_f", o.where(part == 1), commit_id=2)
        store.commit_append("orders_f", 2)
        store.delete_facts(
            "orders_f", o.where(F.pmod(F.col("o_orderkey"), 8) == 0), commit_id=3
        )
        store.append("orders_f", o.where(part == 2), commit_id=3)
        store.commit_append("orders_f", 3)

        out = (
            store.read_facts_changes(spark, "orders_f", since=1)
            .groupBy(
                F.col("_change_type").alias("change_type"),
                F.col("_commit").alias("commit_id"),
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            )
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "store_merge_into",
    oracle="""
    SELECT CAST(o_orderkey % 4 AS INTEGER) AS key_class,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(val) AS BIGINT) AS val_sum
    FROM (
      SELECT o_orderkey, o_orderkey AS val FROM orders
      WHERE o_orderkey % 4 = 0 AND o_orderkey % 8 <> 0
      UNION ALL
      SELECT o_orderkey, o_orderkey * 10 FROM orders WHERE o_orderkey % 4 = 1
      UNION ALL
      SELECT o_orderkey, o_orderkey * 100 FROM orders WHERE o_orderkey % 4 = 3
    )
    GROUP BY 1
    """,
)
def store_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10-ext — MERGE INTO (the Delta/Iceberg statement) end-to-end on
    a real TableStore (pipeline/store.py::merge_into): commit 1 seeds
    key classes %4∈{0,1}; merge #1 (matched=update, not_matched=None)
    sends classes {1,2} at val×10 — class 1 updates, class 2 is
    DISCARDED (no insert clause); merge #2 (matched=delete,
    not_matched=insert) sends the %8==0 keys plus class 3 at val×100 —
    the former are tombstoned, the latter inserted. The oracle replays
    the surviving versions as key-mod set algebra. Each merge stages
    tombstone + append under ONE commit (atomic at the pointer flip),
    and the matched/unmatched probe is the only target read."""
    import shutil
    import tempfile

    from ..pipeline.store import TableStore

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    part = F.pmod(F.col("o_orderkey"), 4)
    d = tempfile.mkdtemp(prefix="merge_store_")
    try:
        store = TableStore(d)
        seed = o.where(part.isin(0, 1)).select(
            "o_orderkey", F.col("o_orderkey").alias("val")
        )
        store.append("orders_f", seed, commit_id=1)
        store.commit_append("orders_f", 1)

        src1 = o.where(part.isin(1, 2)).select(
            "o_orderkey", (F.col("o_orderkey") * 10).alias("val")
        )
        store.merge_into(
            spark, "orders_f", src1, ["o_orderkey"], commit_id=2,
            when_matched="update", when_not_matched=None,
        )
        store.commit_append("orders_f", 2)

        src2 = o.where(
            (F.pmod(F.col("o_orderkey"), 8) == 0) | (part == 3)
        ).select("o_orderkey", (F.col("o_orderkey") * 100).alias("val"))
        store.merge_into(
            spark, "orders_f", src2, ["o_orderkey"], commit_id=3,
            when_matched="delete", when_not_matched="insert",
        )
        store.commit_append("orders_f", 3)

        out = (
            store.read_facts(spark, "orders_f")
            .groupBy(
                F.pmod(F.col("o_orderkey"), 4).cast("int").alias("key_class")
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("val").cast("bigint").alias("val_sum"),
            )
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "store_incremental_agg",
    oracle="""
    WITH fin AS (
      SELECT o_orderkey, o_orderkey AS val FROM orders
      WHERE o_orderkey % 4 = 0 AND o_orderkey % 8 <> 0
      UNION ALL
      SELECT o_orderkey, o_orderkey * 10 FROM orders
      WHERE o_orderkey % 4 IN (1, 2)
    )
    SELECT CAST(o_orderkey % 7 AS INTEGER) AS grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(val) AS BIGINT) AS val_sum
    FROM fin GROUP BY 1
    """,
)
def store_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10-ext — INCREMENTAL MATERIALIZED-VIEW REFRESH off the change
    feed (the Delta/Materialize pattern): a grouped aggregate snapshot
    taken at commit 1 is advanced to the table's head by folding ONLY
    the feed's deltas — inserts contribute (+1, +val), deletes
    (-1, -pre_val) — never rescanning the table. The oracle is the
    full recompute over the final state, so driver parity proves
    incremental == full every round.

    History: commit 1 seeds key classes %4∈{0,1} at val=key; commit 2
    is an UPSERT of classes {1,2} at val×10 (the feed shows it as
    delete(class-1 keys) + insert(both classes) — update = tombstone +
    append in one commit); commit 3 equality-deletes the %8==0 keys.

    Delete pre-images: merge-on-read tombstones carry keys only, so
    the subtraction side joins the deleted keys back to the
    ``read_facts_at_commit(1)`` time-travel snapshot — valid here
    because no key is modified twice after the MV snapshot (class-1
    deletes at commit 2 and %8==0 deletes at commit 3 both kill
    commit-1 rows). The general case replays per commit with the
    snapshot at each delete's predecessor — same plan shape, one
    bounded feed-range read per step. Scale shape: the MV base is one
    combinable groupBy over the snapshot; the refresh reads O(changed
    commits) feed rows, one broadcast-eligible pre-image semi-join,
    and one final combinable groupBy over (|groups| + |changes|) rows
    — a 100 TB table with a quiet day refreshes in O(day), not
    O(history)."""
    import shutil
    import tempfile

    from ..pipeline.store import TableStore

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    part = F.pmod(F.col("o_orderkey"), 4)
    grp = F.pmod(F.col("o_orderkey"), 7).cast("int")
    d = tempfile.mkdtemp(prefix="mv_store_")
    try:
        store = TableStore(d)
        seed = o.where(part.isin(0, 1)).select(
            "o_orderkey", F.col("o_orderkey").cast("long").alias("val")
        )
        store.append("orders_f", seed, commit_id=1)
        store.commit_append("orders_f", 1)

        src = o.where(part.isin(1, 2)).select(
            "o_orderkey", (F.col("o_orderkey") * 10).cast("long").alias("val")
        )
        store.upsert_facts("orders_f", src, ["o_orderkey"], commit_id=2)
        store.commit_append("orders_f", 2)

        store.delete_facts(
            "orders_f",
            o.where(F.pmod(F.col("o_orderkey"), 8) == 0),
            commit_id=3,
        )
        store.commit_append("orders_f", 3)

        base = store.read_facts_at_commit(spark, "orders_f", 1)
        mv = base.groupBy(grp.alias("grp")).agg(
            F.count(F.lit(1)).cast("long").alias("dn"),
            F.sum("val").cast("long").alias("dv"),
        )
        feed = store.read_facts_changes(spark, "orders_f", since=1)
        ins = feed.where(F.col("_change_type") == "insert").select(
            grp.alias("grp"),
            F.lit(1).cast("long").alias("dn"),
            F.col("val").cast("long").alias("dv"),
        )
        dels = (
            feed.where(F.col("_change_type") == "delete")
            .select("o_orderkey")
            .join(base, "o_orderkey")
            .select(
                grp.alias("grp"),
                F.lit(-1).cast("long").alias("dn"),
                (-F.col("val")).cast("long").alias("dv"),
            )
        )
        out = (
            mv.unionByName(ins)
            .unionByName(dels)
            .groupBy("grp")
            .agg(
                F.sum("dn").cast("bigint").alias("n"),
                F.sum("dv").cast("bigint").alias("val_sum"),
            )
            .where(F.col("n") > 0)
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "period_windows",
    oracle="""
    WITH b AS (SELECT min(ts) AS lo, max(ts) AS hi FROM events),
    g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 120 MINUTE)) AS ps FROM b)
    SELECT CAST(row_number() OVER (ORDER BY ps) - 1 AS INTEGER) AS period_id,
           ps AS period_start,
           ps + INTERVAL 120 MINUTE AS period_end
    FROM g
    """,
)
def period_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — `create_period_list` (app/db/postgres.py:314-325): chop
    [sink_tip, source_tip] into 120-minute micro-batch periods, fully
    declaratively (sequence + posexplode; no driver loop)."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    return bounds.select(
        F.posexplode(F.expr("sequence(lo, hi, INTERVAL 120 MINUTES)")).alias(
            "period_id", "period_start"
        )
    ).select(
        F.col("period_id").cast("int"),
        "period_start",
        (F.col("period_start") + F.expr("INTERVAL 120 MINUTES")).alias("period_end"),
    )


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT CAST(TIMESTAMP '1970-01-01 00:00:00'
                + to_seconds(CAST(floor(epoch(ts) / 7200) * 7200 AS BIGINT))
                AS TIMESTAMP) AS period_start,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((SUM(value)) * 100 + 0.5) / 100 AS total_value
    FROM events GROUP BY 1
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — tumbling 120-minute event-time windows (`F.window`; epoch-
    aligned, identical to the oracle's floor(epoch/7200) bucketing)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "120 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fround(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("period_start"), "n_events", "total_value")
    )


@register(
    "replay_idempotent",
    oracle="""
    SELECT DISTINCT event_id, ts, value FROM (
      SELECT event_id, ts, value FROM events
      UNION ALL
      SELECT event_id, ts, value FROM events
    )
    """,
)
def replay_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 — replay idempotence: re-delivering a whole batch then
    deduplicating by key yields the original rows (the property the
    reference's IdIndex protects, app/db/id_index.py:22-25)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    return e.unionByName(e).dropDuplicates(["event_id"])


@register(
    "store_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT c_custkey AS k, c_acctbal AS v
      FROM customer WHERE c_custkey % 4 <> 3
    ),
    v2 AS (
      SELECT c_custkey AS k,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
                  ELSE c_acctbal END AS v
      FROM customer WHERE c_custkey % 11 <> 0
    ),
    j AS (
      SELECT COALESCE(v1.k, v2.k) AS k,
             CASE WHEN v1.k IS NULL THEN 'added'
                  WHEN v2.k IS NULL THEN 'removed'
                  WHEN v1.v IS DISTINCT FROM v2.v THEN 'changed' END AS ct
      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    )
    SELECT ct AS change_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS key_sum
    FROM j WHERE ct IS NOT NULL GROUP BY 1
    """,
)
def store_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10-ext — row-level DIFF BETWEEN TWO SNAPSHOTS through a real
    TableStore (pipeline/store.py::diff — Iceberg's snapshot-compare /
    Delta's table_changes audit surface, previously test-covered but
    not oracle-paired): two dim versions land under snapshot tags, and
    diff() classifies every key as added / removed / changed via two
    O(1)-metadata time-travel reads + ONE full-outer equi-join with
    null-safe struct equality — no row hashing, no driver state, so
    the plan at 100 TB is one key-partitioned shuffle of the two
    version frames. The update set is deterministic key-mod algebra
    (drop k%11==0, add the k%4==3 cohort, shift balances of k%7==0 by
    an exact +100), which the oracle replays as plain SQL over the
    base table. Unchanged keys are dropped — the audit reads only
    churn, never the table."""
    import shutil
    import tempfile

    from ..pipeline.store import TableStore

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("v")
    )
    v1 = c.where(F.pmod(F.col("k"), 4) != 3)
    v2 = c.where(F.pmod(F.col("k"), 11) != 0).select(
        "k",
        F.when(F.pmod(F.col("k"), 7) == 0, F.col("v") + 100)
        .otherwise(F.col("v"))
        .alias("v"),
    )
    d = tempfile.mkdtemp(prefix="snapdiff_store_")
    try:
        store = TableStore(d)
        store.repoint("dim", store.stage("dim", v1))
        store.snapshot("t_a")
        store.repoint("dim", store.stage("dim", v2))
        store.snapshot("t_b")
        out = (
            store.diff(spark, "dim", "t_a", "t_b", ["k"])
            .groupBy("change_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("k").cast("bigint").alias("key_sum"),
            )
        )
        rows = out.collect()
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "store_describe_history",
    oracle="""
    SELECT 1 AS commit_id, 'append' AS operation,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT 2, 'append', CAST(count(*) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT 3, 'delete', CAST(count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT 4, 'append', CAST(count(*) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 2 AND o_orderkey % 7 = 0
    UNION ALL
    SELECT 4, 'delete', CAST(count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 2 AND o_orderkey % 7 = 0
    """,
)
def store_describe_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10-ext — DESCRIBE HISTORY through a real TableStore
    (pipeline/store.py::describe_history): two appends, an
    equality-delete, and an upsert land; the history audit reads ONE
    row per (commit, operation) from the commit manifests — O(#commit
    dirs) metadata, zero data pages (the upsert honestly shows as its
    two on-disk halves at one commit id). The oracle replays every
    count as key-mod algebra over orders, so manifest row counts are
    themselves under the hash gate — a wrong manifest (the thing every
    other metadata-skipping read trusts) fails parity here."""
    import shutil
    import tempfile

    from ..pipeline.store import TableStore

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    d = tempfile.mkdtemp(prefix="hist_store_")
    try:
        store = TableStore(d)
        store.append("facts", o.where(F.col("o_orderkey") % 3 == 0), commit_id=1)
        store.commit_append("facts", 1)
        store.append("facts", o.where(F.col("o_orderkey") % 3 == 1), commit_id=2)
        store.commit_append("facts", 2)
        store.delete_facts(
            "facts", o.where(F.col("o_orderkey") % 5 == 0), commit_id=3
        )
        store.commit_append("facts", 3)
        up = o.where(
            (F.col("o_orderkey") % 3 == 2) & (F.col("o_orderkey") % 7 == 0)
        )
        store.upsert_facts("facts", up, key_cols=["o_orderkey"], commit_id=4)
        store.commit_append("facts", 4)
        out = store.describe_history(spark, "facts")
        rows = out.collect()
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "store_tpch_refresh",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                 / 100.0 * 100 + 0.5) / 100 AS sum_qty,
           floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 / 100.0 * 100 + 0.5) / 100 AS sum_base_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_orderkey % 10 <> 0
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def store_tpch_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H REFRESH STREAM (RF1 + RF2) through a real TableStore —
    the spec's forgotten half (every engine benchmarks the 22 reads;
    the refresh functions are what make it a DATABASE benchmark): the
    base load lands as commit 1, RF1 new-sales inserts append as
    commit 2, RF2 old-sales deletes land as an order-key equality
    tombstone at commit 3 (killing base AND RF1 rows of those orders —
    the sequence rule), and Q1's pricing summary runs over the merged
    read. The oracle computes the same summary directly over the
    refreshed row set by key-mod algebra, so the append/tombstone/
    merged-read machinery is certified by the business query's hash —
    not by counting rows. Integer micro-unit money sums as in
    tpch_q1_pricing_summary."""
    import shutil
    import tempfile

    from ..pipeline.store import TableStore

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
    )
    d = tempfile.mkdtemp(prefix="tpch_rf_store_")
    try:
        store = TableStore(d)
        store.append(
            "lineitem_f", li.where(F.col("l_orderkey") % 4 < 3), commit_id=1
        )
        store.commit_append("lineitem_f", 1)
        store.append(
            "lineitem_f", li.where(F.col("l_orderkey") % 4 == 3), commit_id=2
        )
        store.commit_append("lineitem_f", 2)
        store.delete_facts(
            "lineitem_f",
            li.where(F.col("l_orderkey") % 10 == 0).select("l_orderkey"),
            commit_id=3,
        )
        store.commit_append("lineitem_f", 3)
        cur = store.read_facts(spark, "lineitem_f")
        cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
        # integer centi-unit discipline (the sum_base_price shape), not a
        # raw double->bigint cast: Spark CAST truncates, DuckDB rounds
        # half-even, so a raw cast only agrees while quantities are whole.
        qcents = F.floor(F.col("l_quantity") * 100 + 0.5).cast("bigint")
        out = (
            cur.groupBy("l_returnflag", "l_linestatus")
            .agg(
                fround(F.sum(qcents) / 100.0, 2).alias("sum_qty"),
                fround(F.sum(cents) / 100.0, 2).alias("sum_base_price"),
                F.count(F.lit(1)).cast("bigint").alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )
        rows = out.collect()
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "store_occ_commits",
    oracle="""
    SELECT w.writer, s.seq,
           CAST(w.writer * 100 + s.seq AS BIGINT) AS val,
           CAST(6 AS BIGINT) AS n_commits
    FROM (VALUES (1), (2)) AS w(writer),
         (VALUES (0), (1), (2)) AS s(seq)
    """,
)
def store_occ_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMISTIC CONCURRENCY through the TableStore writer fence
    (pipeline/store.py claim_commit/begin_commit/append_occ — the
    round-13 closure of the r12 'concurrent writers' gap): TWO
    concurrent writers race six appends onto the same fact table
    through the claim protocol (O_CREAT|O_EXCL on claims/<id>, re-read
    the head on loss). The oracle is the full cross of (writer, seq)
    rows plus the commit count — every staged commit must land under
    its own id and NONE may be silently discarded by a losing pointer
    flip, so a lost update fails the row-count AND hash gates. The
    two-process interleaving variant (real SIGKILL-able writers, dead-
    claim steal) runs in tests/test_store_manifest.py; this entry makes
    the fence a driver-gated feature, not just a tested one. Reference
    analogue: none — the reference is a single daemon; this is the
    Delta/Iceberg optimistic-commit extension on this store."""
    import shutil
    import tempfile
    import threading

    from ..pipeline.store import TableStore

    d = tempfile.mkdtemp(prefix="occ_store_")
    try:
        store = TableStore(d)
        errs: list = []

        def writer(wid: int) -> None:
            try:
                for seq in range(3):
                    # one-row commit = ONE task / ONE file: parallelize
                    # with numSlices=1 instead of the default
                    # defaultParallelism slices (32 tasks, 31 empty,
                    # per write job). NOT .coalesce(1): a Coalesce over
                    # the 32-slice local relation measured a ~6s/job
                    # scheduler pathology vs 0.6s for a born-single-
                    # partition frame (round-16 A/B).
                    df = spark.createDataFrame(
                        spark.sparkContext.parallelize(
                            [(wid, seq, wid * 100 + seq)], 1
                        ),
                        "writer int, seq int, val bigint",
                    )
                    store.append_occ("t", df)
            except Exception as exc:  # pragma: no cover - surfaced below
                errs.append(exc)

        ts = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        if errs:
            raise RuntimeError(f"OCC writer failed: {errs[0]!r}")
        n = store.current_version("t")
        out = store.read_facts(spark, "t").select(
            "writer", "seq", "val", F.lit(n).cast("bigint").alias("n_commits")
        )
        rows = out.collect()
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "store_occ_multi_commits",
    oracle="""
    SELECT t.tbl, w.writer, s.seq,
           CAST(w.writer * 100 + s.seq AS BIGINT) AS val,
           CAST(6 AS BIGINT) AS n_commits
    FROM (VALUES ('dims'), ('facts')) AS t(tbl),
         (VALUES (1), (2)) AS w(writer),
         (VALUES (0), (1), (2)) AS s(seq)
    """,
)
def store_occ_multi_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TABLE optimistic concurrency through the writer fence
    (pipeline/store.py begin_commit_many/commit_many_occ — the round-14
    closure of the r13 'commit_many is single-writer' gap): TWO
    concurrent writers race three two-table commits each onto the SAME
    (facts, dims) pair, passing their table sets in OPPOSITE orders —
    the classic deadlock shape, which the fence defuses by claiming in
    a global sorted-table-name order. Every commit claims BOTH tables'
    next ids before staging either, so the daemon-vs-compactor race
    can neither lose a staged flip nor interleave into deadlock. The
    oracle is the full (table, writer, seq) cross plus the per-table
    commit count: a lost update fails rows AND hash; a deadlock fails
    as the join timeout. The two-PROCESS variant with marker files
    runs in tests/test_store_manifest.py
    (test_occ_multi_table_two_process_race); this entry makes the
    multi-table fence a driver-gated feature. Reference analogue: the
    per-period conn.commit() (app/main.py:379) is single-writer by
    construction — this is the Delta/Iceberg-style extension."""
    import shutil
    import tempfile
    import threading

    from ..pipeline.store import TableStore

    d = tempfile.mkdtemp(prefix="occ_multi_store_")
    try:
        store = TableStore(d)
        errs: list = []

        def writer(wid: int, order: tuple) -> None:
            try:
                for seq in range(3):
                    def stage(table):
                        def _s(cid, table=table):
                            # one-row commit = one task / one file
                            # (numSlices=1; see store_occ_commits)
                            store.append(
                                table,
                                spark.createDataFrame(
                                    spark.sparkContext.parallelize(
                                        [(wid, seq, wid * 100 + seq)], 1
                                    ),
                                    "writer int, seq int, val bigint",
                                ),
                                commit_id=cid,
                            )
                        return _s

                    store.commit_many_occ({t: stage(t) for t in order})
            except Exception as exc:  # pragma: no cover - surfaced below
                errs.append(exc)

        ts = [
            threading.Thread(target=writer, args=(1, ("facts", "dims"))),
            threading.Thread(target=writer, args=(2, ("dims", "facts"))),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        if errs:
            raise RuntimeError(f"OCC multi-table writer failed: {errs[0]!r}")
        out = None
        for tbl in ("dims", "facts"):
            n = store.current_version(tbl)
            leg = store.read_facts(spark, tbl).select(
                F.lit(tbl).alias("tbl"),
                "writer",
                "seq",
                "val",
                F.lit(n).cast("bigint").alias("n_commits"),
            )
            out = leg if out is None else out.unionByName(leg)
        rows = out.collect()
        return local_result(spark, rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)
