"""SyncEngine — the incremental NFT-activity sync as Spark plans.

Re-expresses the reference daemon end-to-end (/root/reference/app/
main.py:26-388 + app/db/postgres.py:251-402), replacing every piece of
driver-side state with a distributed equivalent:

| reference mechanism                         | here                                   |
|---------------------------------------------|----------------------------------------|
| IdIndex dicts (natkey→id)                   | broadcast left-anti joins on the dims  |
| next-id counters (A5 max-id probe)          | max(id)+1 scalar + dense-rank offsets  |
| ordered row loop, later-rows-overwrite (D3) | per-key argmax windows over `seq`      |
| per-period SQL + fetchall                   | pushed-down period predicate, no collect|
| insert lists + per-table bulk INSERT        | append-only fact partitions, versioned dims |
| tip/period loop (G1/G2)                     | data-derived tips + period iteration   |

Row order: the reference relies on `ORDER BY b3.time asc` and
result-set order within equal times (Postgres-plan-dependent). We fix a
deterministic total order `seq` = (tx_time, tx_id, ma_id, leg, sub_id)
assigned with the per-partition-offset technique — no single-partition
global window (SURVEY.md §4 item 1).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..functions.cardano import staking_address_udf
from ..functions.hexstr import hex_to_string, lower_hex
from ..operators.surrogate import with_dense_ids, with_dense_ids_grouped
from .fixtures import GENESIS
from .store import MANIFEST, TableStore

SEQ_ORDER = ["tx_time", "tx_id", "ma_id", "leg_order", "sub_id"]

from .schemas import FACT_TABLES  # noqa: E402  (single source of truth)

DIM_TABLES = ("wallet", "collection", "asset", "asset_ext")


@pandas_udf(StringType())
def pg_escape_udf(names):  # binary series → Postgres encode(...,'escape') text
    import pandas as pd

    from .fixtures import pg_escape

    return pd.Series([pg_escape(bytes(b)) if b is not None else None for b in names])


class SyncEngine:
    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        store: TableStore,
        time_interval_minutes: int = 120,
        tip_buffer_blocks: int = 3,
        genesis: datetime = GENESIS,
        retention_keep_last: int | None = None,
        compact_every: int | None = None,
        cluster_facts_by: str | list[str] | None = None,
        dim_id_strategy: str = "checkpoint",
    ) -> None:
        self.spark = spark
        self.source_dir = source_dir
        self.store = store
        self.interval = timedelta(minutes=time_interval_minutes)
        self.tip_buffer = tip_buffer_blocks
        self.genesis = genesis
        # opt-in storage retention: vacuum superseded dim versions after
        # each period (a long-running sync otherwise keeps one version
        # per table per period forever); snapshots stay protected
        self.retention_keep_last = retention_keep_last
        # opt-in small-files hygiene: merge fact append dirs every N
        # periods (store.compact_facts — crash-journaled, preserves
        # read_facts/read_at row sets and snapshot watermarks exactly)
        self.compact_every = compact_every
        # opt-in sort-on-write layout for fact appends AND compaction
        # merges (store.append/compact_facts cluster_by): files become
        # disjoint ranges of this column — or, with a LIST of columns,
        # Z-ordered rectangles (operators/zorder.py) — so range readers
        # prune at file/row-group level on top of the commit manifests.
        # Off by default — it adds a range shuffle of each period's new
        # rows to the sync hot path; turn it on when read patterns are
        # time-ranged (the analytics default at 100 TB).
        self.cluster_facts_by = cluster_facts_by
        # dense-id strategy for the three SMALL per-period dim frames
        # (new wallets/collections/assets). "checkpoint" (default)
        # freezes each; "sample" derives order-aligned buckets with no
        # materialization (operators/surrogate.py) — their inputs are
        # cheap re-aggregations of the frozen records checkpoint, and
        # the min(seq)-style order keys are unique by construction
        # (each seq belongs to exactly one group's row set).
        self.dim_id_strategy = dim_id_strategy
        # per-run carry-forward (see process_period): None = must probe
        self._seeds: dict[str, int] | None = None
        self._dim_totals: dict[str, int] | None = None

    # --- sources -------------------------------------------------------------

    def src(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.source_dir, f"{name}.parquet"))

    # --- tips & periods (G1/G2) ----------------------------------------------

    def cardano_tip(self) -> datetime | None:
        """Source tip with the reference's 3-block safety buffer
        (`ORDER BY time DESC LIMIT 1 OFFSET 3`, app/db/postgres.py:262-278)."""
        rows = (
            self.src("block")
            .orderBy(F.col("time").desc())
            .limit(self.tip_buffer + 1)
            .collect()
        )
        if len(rows) <= self.tip_buffer:
            return None
        return rows[self.tip_buffer]["time"]

    def pantasia_tip(self) -> datetime:
        """Sink tip = max fact tx_time, else genesis (app/db/postgres.py:280-312).
        Derived from committed data, so a crash between fact commits and
        checkpointing replays the period instead of skipping it.

        Reads per-commit manifests (parquet footer stats folded at
        commit time, pipeline/store.py), NOT the fact parquet: the
        reference's tip is an O(1) Postgres index probe; ours is an
        O(#commits) metadata fold that launches no Spark job and scans
        zero fact rows — the same property (tip comes only from
        committed data) because the manifest is written inside the
        commit dir before the pointer flip."""
        tips = [
            tip
            for t in FACT_TABLES
            if (tip := self._facts_max_or_scan(t, "tx_time")) is not None
        ]
        return max(tips) if tips else self.genesis

    def _facts_max_or_scan(self, table: str, column: str):
        """max(column) over committed facts: manifest fold when the
        footers recorded stats for the column, DATA SCAN fallback when
        committed rows exist but carry none (e.g. INT96 timestamps —
        Spark's legacy parquet timestamp layout writes NO footer
        statistics). Without the fallback, a stats-less history would
        read as empty: pantasia_tip would restart from genesis and
        re-append the whole fact history under new commit ids."""
        m = self.store.facts_stats(table)
        if m is None or m["rows"] == 0:
            return None
        s = m["stats"].get(column)
        if s is not None:
            return s["max"]
        df = self.store.read_facts(self.spark, table)
        return df.agg(F.max(column)).collect()[0][0]

    def period_list(self) -> list[tuple[datetime, datetime]]:
        lo = self.pantasia_tip()
        hi = self.cardano_tip()
        periods = []
        if hi is None:
            return periods
        cur = lo
        while cur < hi:
            nxt = min(cur + self.interval, hi)
            periods.append((cur, nxt))
            cur = nxt
        return periods

    # --- extraction (the flagship query, A2/B/C ops) --------------------------

    def extract(self, lo: datetime, hi: datetime) -> DataFrame:
        """Spark form of ``pantasia_get_records`` (app/db/postgres.py:327-402):
        burn leg ∪ output leg, broadcast dimension joins, decorrelated
        lateral CIP-25 metadata with dynamic JSON path keys."""
        block = self.src("block").where((F.col("time") > F.lit(lo)) & (F.col("time") <= F.lit(hi)))
        tx = self.src("tx").select(
            F.col("id").alias("tx_id"), lower_hex("hash").alias("tx_hash"), "block_id"
        )
        tx_in_range = tx.join(
            block.select(F.col("id").alias("block_id"), F.col("time").alias("tx_time")),
            "block_id",
        ).drop("block_id")

        ma = self.src("multi_asset").select(
            F.col("id").alias("ma_id"),
            lower_hex("policy").alias("policy_id"),
            pg_escape_udf("name").alias("asset_name"),
            lower_hex("name").alias("asset_name_hash"),
            F.col("fingerprint").alias("asset_fingerprint"),
        )
        stake = self.src("stake_address").select(
            F.col("id").alias("stake_address_id"), F.col("view").alias("stake_address")
        )

        burn_leg = (
            self.src("ma_tx_mint")
            .where(F.col("quantity") < 0)
            .join(tx_in_range, "tx_id")
            .join(F.broadcast(ma), F.col("ident") == ma.ma_id)
            .select(
                "ma_id",
                "policy_id",
                "asset_name",
                "asset_name_hash",
                "asset_fingerprint",
                "quantity",
                "tx_id",
                F.lit(None).cast("string").alias("address"),
                F.lit(None).cast("string").alias("stake_address"),
                "tx_hash",
                "tx_time",
                F.lit(0).alias("leg_order"),
                F.lit(-1).cast("long").alias("sub_id"),
            )
        )

        tx_out = self.src("tx_out").select(
            F.col("id").alias("tx_out_id"), "tx_id", "address", "stake_address_id"
        )
        mto = self.src("ma_tx_out").withColumnRenamed("tx_out_id", "mto_out_id")
        out_leg = (
            mto.join(tx_out, mto.mto_out_id == tx_out.tx_out_id)
            .join(tx_in_range, "tx_id")
            .join(F.broadcast(ma), F.col("ident") == ma.ma_id)
            .join(F.broadcast(stake), "stake_address_id", "left")
            .select(
                "ma_id",
                "policy_id",
                "asset_name",
                "asset_name_hash",
                "asset_fingerprint",
                "quantity",
                "tx_id",
                "address",
                "stake_address",
                "tx_hash",
                "tx_time",
                F.lit(1).alias("leg_order"),
                F.col("tx_out_id").alias("sub_id"),
            )
        )

        all_ma_tx = burn_leg.unionByName(out_leg)

        # Decorrelated lateral (C8): mint-membership flag + label-721 JSON.
        meta = (
            self.src("ma_tx_mint")
            .select(F.col("ident").alias("ma_id"), "tx_id")
            .distinct()
            .join(
                self.src("tx_metadata").where(F.col("key") == 721).select("tx_id", "json"),
                "tx_id",
                "left",
            )
            .withColumn("is_mint_tx", F.lit(True))
        )
        # no broadcast hint: ma_tx_mint grows with history; AQE picks the
        # strategy from runtime sizes (the period filter usually shrinks it)
        joined = all_ma_tx.join(meta, ["ma_id", "tx_id"], "left")

        # Dynamic JSON path (B8/§4-item-4): two-level map parse; the inner
        # object is re-stringified by from_json, then literal-path extraction.
        parsed = F.from_json(F.col("json"), "map<string,map<string,string>>")
        inner = parsed[F.col("policy_id")][F.col("asset_name")]
        return joined.select(
            "ma_id",
            "tx_id",
            "policy_id",
            "asset_name",
            "asset_name_hash",
            "asset_fingerprint",
            "quantity",
            "address",
            "stake_address",
            "tx_hash",
            "tx_time",
            "leg_order",
            "sub_id",
            F.coalesce(F.col("is_mint_tx"), F.lit(False)).alias("is_mint_tx"),
            F.get_json_object(inner, "$.image").alias("image"),
            inner.alias("metadata"),
            F.get_json_object(inner, "$.files").alias("files"),
        )

    # --- per-period transform + commit ----------------------------------------

    def _seed(self, table: str) -> int:
        """Next surrogate id (A5, app/db/postgres.py:251-260) from
        commit/version manifests — no fact-history scan, no Spark job
        (see pantasia_tip). Stats-less footers fall back to a data scan
        (never to 1 — that would re-issue existing ids; see
        _facts_max_or_scan)."""
        if table in FACT_TABLES:
            m = self._facts_max_or_scan(table, "id")
        else:
            m = self.store.dim_max(table, "id")
            if m is None:
                df = self.store.read(self.spark, table)
                if df is not None:
                    m = df.agg(F.max("id")).collect()[0][0]
        return (m or 0) + 1

    def process_period(self, lo: datetime, hi: datetime, commit_id: int) -> dict[str, int]:
        from pyspark.sql import Observation

        spark = self.spark
        records = self.extract(lo, hi)
        # Stake derivation (the one irreducible Python UDF, H1) is folded
        # in BEFORE the cache so bech32 runs exactly once per row — the
        # wallet aggregation and the per-row key probe both reuse it.
        records = records.withColumn(
            "stake_derived", staking_address_udf("address")
        ).withColumn("wallet_key", F.coalesce("stake_derived", "address"))
        # (An Observation for the record count was tried and reverted:
        # repartitionByRange inside with_dense_ids evaluates its child
        # twice per job — sampling pass + shuffle pass — so an upstream
        # observe node double-fires. records.count() on the checkpoint
        # blocks below is one cheap job; all OTHER stats ride existing
        # write actions as Observations.)
        # with_dense_ids (default "checkpoint" strategy) freezes its
        # numbered intermediate once, so no extra .cache() is needed:
        # every downstream job reads those checkpoint blocks plus a
        # cheap broadcast join for the offsets. Measured (round 3): the
        # "persist" strategy is 2.1x SLOWER here (31s vs 14.7s at bench
        # scale 1.0) — deserialized caching of these wide JSON-heavy
        # frames costs more than block-serialized checkpoints, the same
        # effect as the rows_wa note below.
        #
        # The records frame is frozen BEFORE the dense-id range shuffle
        # too (round 5): repartitionByRange evaluates its child twice —
        # a boundary-sampling pass plus the shuffle pass — and here the
        # child is the full extraction INCLUDING both pandas UDFs
        # (bech32 + pg_escape) and the CIP-25 JSON parse. Freezing
        # first means both passes read checkpoint blocks instead of
        # re-running the Python stages; measured 34.5s -> 22.5s
        # (+55% rec/s) on the 10x-scale sync.
        records = records.localCheckpoint(eager=True)
        records = with_dense_ids(records, SEQ_ORDER, id_col="seq", start=1)

        wallet_dim = self.store.read(spark, "wallet")
        collection_dim = self.store.read(spark, "collection")
        asset_dim = self.store.read(spark, "asset")
        ext_dim = self.store.read(spark, "asset_ext")

        empty_wallet = wallet_dim is None
        # Seed probes (A5): one max-id scan per table on the FIRST
        # period of a run only. Ids are dense, so subsequent periods
        # carry seeds forward arithmetically from the previous period's
        # write stats (_next_seeds) — the 5 per-period scan jobs the
        # steady-state loop used to pay become zero, and a restart
        # re-probes from committed data (crash-safe, G7).
        if self._seeds is None:
            self._seeds = {t: self._seed(t) for t in (*DIM_TABLES[:3], *FACT_TABLES)}
        seeds = dict(self._seeds)

        # ---- wallets (D2/D4: dedup on natural key, first-seen id order) ----
        addr_rows = records.where(F.col("address").isNotNull()).withColumn(
            "address_type",
            F.when(F.col("stake_derived").isNull(), "ENTERPRISE").otherwise("STAKE"),
        )
        wallet_firsts = addr_rows.groupBy("wallet_key", "address_type").agg(
            F.min("seq").alias("first_seq")
        )
        if not empty_wallet:
            wallet_firsts = wallet_firsts.join(
                wallet_dim.select(F.col("address").alias("wallet_key")),
                "wallet_key",
                "left_anti",
            )
        new_wallets = with_dense_ids(
            wallet_firsts, ["first_seq"], id_col="id", start=seeds["wallet"],
            strategy=self.dim_id_strategy,
        ).select(
            "id",
            F.col("wallet_key").alias("address"),
            "address_type",
            # app-owned column (reference DDL wallet.user_id): the sync
            # loop never assigns users, it only declares the slot
            F.lit(None).cast("int").alias("user_id"),
        )
        wallet_next = (
            new_wallets if empty_wallet else wallet_dim.unionByName(new_wallets)
        )

        # ---- collections ----
        coll_firsts = records.groupBy("policy_id").agg(F.min("seq").alias("first_seq"))
        if collection_dim is not None:
            coll_firsts = coll_firsts.join(
                collection_dim.select("policy_id"), "policy_id", "left_anti"
            )
        new_collections = with_dense_ids(
            coll_firsts, ["first_seq"], id_col="id", start=seeds["collection"],
            strategy=self.dim_id_strategy,
        ).select(
            "id",
            "policy_id",
            # app-owned column (reference DDL collection.name)
            F.lit(None).cast("string").alias("name"),
        )
        collection_next = (
            new_collections
            if collection_dim is None
            else collection_dim.unionByName(new_collections)
        )

        # wallet id per row (burns → NULL). The dim side of the key→id
        # probe is AQE-broadcastable while small; the per-batch addr_map
        # joins back on seq (equi-shuffle, never a driver loop).
        addr_map = (
            addr_rows.select("seq", "wallet_key")
            .join(
                wallet_next.select(
                    F.col("address").alias("wallet_key"), F.col("id").alias("row_wallet_id")
                ),
                "wallet_key",
            )
            .select("seq", "row_wallet_id")
        )
        rows_w = records.join(addr_map, "seq", "left")

        # ---- assets (natural key = fingerprint; insert carries first-row state) ----
        w_first = Window.partitionBy("asset_fingerprint").orderBy("seq")
        firsts = (
            rows_w.withColumn("rn", F.row_number().over(w_first))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        if asset_dim is not None:
            new_asset_firsts = firsts.join(
                asset_dim.select(F.col("fingerprint").alias("asset_fingerprint")),
                "asset_fingerprint",
                "left_anti",
            )
        else:
            new_asset_firsts = firsts
        new_assets = (
            with_dense_ids(
                new_asset_firsts, ["seq"], id_col="id",
                start=seeds["asset"], strategy=self.dim_id_strategy,
            )
            .join(
                collection_next.select(F.col("policy_id"), F.col("id").alias("collection_id")),
                "policy_id",
            )
            .select(
                "id",
                "collection_id",
                F.concat_ws(".", "policy_id", "asset_name_hash").alias("hash"),
                hex_to_string("asset_name_hash").alias("name"),
                F.col("asset_fingerprint").alias("fingerprint"),
                F.col("row_wallet_id").alias("current_wallet_id"),
            )
        )
        asset_all = (
            new_assets if asset_dim is None else asset_dim.unionByName(new_assets)
        )

        # NOT cached (measured): persisting this wide frame costs more
        # than the downstream recomputation it saves — caching it
        # regressed the 10×-scale sync 188s → 293s (the cache fill
        # materializes JSON-heavy columns and blocks AQE broadcast
        # reuse). Only the narrow `records` frame is worth caching.
        rows_wa = rows_w.join(
            asset_all.select(F.col("fingerprint").alias("asset_fingerprint"), F.col("id").alias("asset_id")),
            "asset_fingerprint",
        )

        # ---- facts: ids in seq order per type (mint vs transfer counters) ----
        # ONE grouped numbering instead of two with_dense_ids calls over
        # the mint/transfer halves: same ids (property-pinned in
        # test_properties), but the wide rows_wa frame hits checkpoint
        # blocks once instead of twice — measured ~1s off the scale-1
        # sync wall (two fewer jobs + one fewer shuffle of JSON-heavy
        # columns).
        typed_rows = with_dense_ids_grouped(
            rows_wa,
            ["seq"],
            "is_mint_tx",
            starts={True: seeds["asset_mint_tx"], False: seeds["asset_tx"]},
            id_col="id",
        )
        mint_rows = typed_rows.where(F.col("is_mint_tx"))
        tx_rows = typed_rows.where(~F.col("is_mint_tx"))

        asset_mint_tx_new = mint_rows.select(
            "id",
            "asset_id",
            F.col("row_wallet_id").alias("wallet_id"),
            "quantity",
            "tx_hash",
            "tx_time",
            "image",
            "metadata",
            "files",
        )
        asset_tx_new = tx_rows.select(
            "id",
            "asset_id",
            F.col("row_wallet_id").alias("wallet_id"),
            "quantity",
            "tx_hash",
            "tx_time",
        )

        # ---- latest-state (D3): current wallet + asset_ext ----
        w_last = Window.partitionBy("asset_id").orderBy(F.col("seq").desc())
        last_tx = (
            tx_rows.withColumn("rn", F.row_number().over(w_last))
            .where(F.col("rn") == 1)
            .select("asset_id", F.col("row_wallet_id").alias("last_tx_wallet"), F.col("id").alias("last_tx_id"))
        )
        last_pos_mint = (
            mint_rows.where(F.col("quantity") > 0)
            .withColumn("rn", F.row_number().over(w_last))
            .where(F.col("rn") == 1)
            .select("asset_id", F.col("id").alias("last_mint_id"))
        )

        asset_next = (
            asset_all.join(
                last_tx.select(F.col("asset_id").alias("id"), "last_tx_wallet"),
                "id",
                "left",
            )
            .withColumn(
                "current_wallet_id", F.coalesce("last_tx_wallet", "current_wallet_id")
            )
            .drop("last_tx_wallet")
        )

        ext_updates = (
            last_tx.select("asset_id", F.col("last_tx_id"))
            .join(last_pos_mint, "asset_id", "full")
        )
        if ext_dim is not None:
            ext_next = (
                ext_dim.join(ext_updates, "asset_id", "full")
                .select(
                    F.coalesce("id", "asset_id").alias("id"),
                    "asset_id",
                    F.coalesce("last_mint_id", "latest_mint_tx_id").alias("latest_mint_tx_id"),
                    F.coalesce("last_tx_id", "latest_tx_id").alias("latest_tx_id"),
                )
            )
        else:
            ext_next = ext_updates.select(
                F.col("asset_id").alias("id"),
                "asset_id",
                F.col("last_mint_id").alias("latest_mint_tx_id"),
                F.col("last_tx_id").alias("latest_tx_id"),
            )

        # ---- commit: stage dims, append facts, flip dims before facts ----
        # Per-period stats come from Observation nodes collected DURING
        # the stage/append write actions themselves — zero dedicated
        # count jobs in steady state. Previous dim totals are carried
        # like the seeds (probed once per run, parquet metadata reads).
        if self._dim_totals is None:
            # manifest rows, not df.count(): first-period probe = zero jobs
            self._dim_totals = {
                t: (self.store.dim_stats(t) or {"rows": 0})["rows"]
                for t in ("wallet", "collection", "asset")
            }
        prev_counts = dict(self._dim_totals)
        n_obs = {t: Observation() for t in ("wallet", "collection", "asset")}
        w_obs = {t: Observation() for t in FACT_TABLES}
        cnt = F.count(F.lit(1)).alias("n")
        # The six write actions (4 dim stages + 2 fact appends) are
        # mutually independent once the shared `records` checkpoint
        # exists, so they are SUBMITTED CONCURRENTLY: the Spark
        # scheduler interleaves their stages across free slots instead
        # of paying six sequential job tails (driver-side scheduling +
        # output commit latency). Same on a cluster — concurrent
        # actions from one driver are the standard way to overlap
        # independent writes. Crash semantics unchanged: every pointer
        # flip still happens after ALL writes land (stage-then-flip),
        # and a failure in any future aborts the period before any
        # repoint.
        from concurrent.futures import ThreadPoolExecutor

        writes = {
            "wallet": lambda: self.store.stage(
                "wallet", wallet_next.observe(n_obs["wallet"], cnt)
            ),
            "collection": lambda: self.store.stage(
                "collection", collection_next.observe(n_obs["collection"], cnt)
            ),
            "asset": lambda: self.store.stage(
                "asset", asset_next.observe(n_obs["asset"], cnt)
            ),
            "asset_ext": lambda: self.store.stage("asset_ext", ext_next),
            "asset_tx": lambda: self.store.append(
                "asset_tx",
                asset_tx_new.observe(w_obs["asset_tx"], cnt),
                commit_id,
                cluster_by=self.cluster_facts_by,
            ),
            "asset_mint_tx": lambda: self.store.append(
                "asset_mint_tx",
                asset_mint_tx_new.observe(w_obs["asset_mint_tx"], cnt),
                commit_id,
                cluster_by=self.cluster_facts_by,
            ),
        }
        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            futures = {t: pool.submit(fn) for t, fn in writes.items()}
            staged = {
                t: futures[t].result() for t in DIM_TABLES
            }  # .result() re-raises: abort before any pointer moves
            for t in FACT_TABLES:
                futures[t].result()
        for table, version in staged.items():
            self.store.repoint(table, version)
        self.store.commit_append("asset_tx", commit_id)
        self.store.commit_append("asset_mint_tx", commit_id)

        totals = {t: int(n_obs[t].get["n"]) for t in n_obs}
        stats = {
            "records": records.count(),
            "new_wallets": totals["wallet"] - prev_counts["wallet"],
            "new_collections": totals["collection"] - prev_counts["collection"],
            "new_assets": totals["asset"] - prev_counts["asset"],
            "asset_tx": int(w_obs["asset_tx"].get["n"]),
            "asset_mint_tx": int(w_obs["asset_mint_tx"].get["n"]),
        }
        self._dim_totals = totals
        # dense ids ⇒ next seed = this seed + rows written; keeps the
        # next period's probe-free (validated against a fresh probe by
        # tests/test_pipeline_e2e.py seed-carry test)
        self._seeds = {
            "wallet": seeds["wallet"] + stats["new_wallets"],
            "collection": seeds["collection"] + stats["new_collections"],
            "asset": seeds["asset"] + stats["new_assets"],
            "asset_tx": seeds["asset_tx"] + stats["asset_tx"],
            "asset_mint_tx": seeds["asset_mint_tx"] + stats["asset_mint_tx"],
        }
        return stats

    # --- driver loop (one pass; poll/backoff belongs to the caller) -----------

    def ensure_bootstrap(self) -> None:
        """DDL-bootstrap parity (A9): the reference creates all seven
        target tables up front (app/db/postgres.py:94-156), including
        the app-owned ``user`` table the sync loop never writes. Create
        it empty with the declared schema so the store's table surface
        matches the reference's DDL."""
        from .schemas import TARGET_SCHEMAS

        if self.store.current_version("user") is None:
            empty = self.spark.createDataFrame([], TARGET_SCHEMAS["user"])
            self.store.repoint("user", self.store.stage("user", empty))

    def _recover_fact_commits(self) -> None:
        """Roll FORWARD an interrupted multi-table fact commit (G7).

        ``process_period`` flips the fact pointers sequentially, after
        every commit dir (data + manifest) has landed. A crash BETWEEN
        the two ``commit_append`` calls leaves table A at commit N and
        table B at N-1 with B's ``commit=N`` dir fully written but
        invisible — and that invisibility is dangerous, not just stale:
        ``pantasia_tip`` is max() across fact tables, so period N is
        never replayed for B, and ``_seed`` (max COMMITTED id) would
        hand the next period ids that collide with the orphan dir's
        rows the moment a later flip makes it visible (``<= ptr``
        pruning). Because the manifest is written INSIDE the commit dir
        before any pointer moves, a present manifest IS the commit
        record — so this is write-ahead-log roll-forward: repoint each
        lagging fact table across every complete-but-unflipped dir up
        to the fleet-max commit id. A dir missing its manifest means
        the crash hit before any flip; the whole period replays from
        the tip and the replay's append overwrites the partial dir, so
        recovery must (and does) leave it alone. Reference analogue:
        the single Postgres transaction wrapping all nine table writes
        (/root/reference/app/main.py:379) — one commit point, never a
        window between tables."""
        ptrs = {t: self.store.current_version(t) or 0 for t in FACT_TABLES}
        target = max(ptrs.values())
        for t, ptr in ptrs.items():
            nxt = ptr
            while nxt < target:
                d = self.store.append_dir(t, nxt + 1)
                if not os.path.exists(os.path.join(d, MANIFEST)):
                    break
                nxt += 1
            if nxt != ptr:
                self.store.repoint(t, nxt)

    def run_sync(
        self,
        max_periods: int | None = None,
        shutdown: "GracefulShutdown | None" = None,
    ) -> list[dict[str, int]]:
        """One sync pass. With a ``shutdown`` handle (G6), a SIGINT/
        SIGTERM between periods stops the loop after the in-flight
        period's transactional commit — the store stays consistent and
        the next run_sync resumes from the data-derived tip."""
        self.ensure_bootstrap()
        self._recover_fact_commits()
        # fresh probe per run: carried seeds/totals are an in-run
        # optimization only, never trusted across restarts (G7 crash
        # recovery)
        self._seeds = None
        self._dim_totals = None
        out = []
        periods = self.period_list()
        if max_periods is not None:
            periods = periods[:max_periods]
        base_commit = self.store.current_version("asset_tx") or 0
        for i, (lo, hi) in enumerate(periods, start=1):
            if shutdown is not None and shutdown.stop_requested:
                break
            out.append(self.process_period(lo, hi, commit_id=base_commit + i))
            if self.retention_keep_last is not None:
                self.store.vacuum(keep_last=self.retention_keep_last)
            if self.compact_every is not None and i % self.compact_every == 0:
                for t in FACT_TABLES:
                    self.store.compact_facts(
                        self.spark, t, cluster_by=self.cluster_facts_by
                    )
        return out

    def run_daemon(
        self,
        shutdown: "GracefulShutdown",
        poll_seconds: float = 10.0,
        max_polls: int | None = None,
        on_idle=None,
    ) -> list[dict[str, int]]:
        """The reference's daemon loop (/root/reference/app/main.py:43-57):
        poll the source tip forever; when it advances, extend the period
        list and sync the new periods; when it has not, back off
        ``poll_seconds`` (the reference's "Pause 10 seconds so that
        Postgres doesn't get spammed") and poll again. ``shutdown`` is
        the reference's GracefulKiller: a SIGINT/SIGTERM arriving
        mid-period lets the in-flight period's transactional commit
        finish, then exits the loop — the next ``run_daemon`` resumes
        from the data-derived tips (G1/G6/G7 chained).

        ``on_idle`` (optional) fires once per no-new-tip poll — a
        metrics/backoff hook; ``max_polls`` bounds the loop for tests
        (the production daemon runs unbounded)."""
        import time as _t

        stats: list[dict[str, int]] = []
        old_tip = None
        polls = 0
        while not shutdown.stop_requested:
            if max_polls is not None and polls >= max_polls:
                break
            polls += 1
            tip = self.cardano_tip()
            if tip is not None and tip != old_tip:
                stats.extend(self.run_sync(shutdown=shutdown))
                old_tip = tip
            else:
                if on_idle is not None:
                    on_idle()
                if shutdown.stop_requested:
                    break
                _t.sleep(poll_seconds)
        return stats
