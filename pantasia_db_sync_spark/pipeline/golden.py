"""Golden replay: the reference's row-loop semantics, independently.

A deliberately *naive* single-threaded re-implementation of the sync
transform — DuckDB runs the extraction joins, then a Python loop
replays the per-row state machine exactly as /root/reference/app/
main.py:109-330 behaves (dict-based dims, sequential counters,
later-rows-overwrite). The Spark pipeline (sync.py) must produce
byte-equal final tables; this file is the e2e oracle (SURVEY.md §5.2).

Row order within equal block times is Postgres-plan-dependent in the
reference; both sides here fix the deterministic total order
(tx_time, tx_id, ma_id, leg_order, sub_id).

Semantics notes mirrored from the reference:
- wallet natural key = derived staking address when the payment address
  carries a stake-key part, else the payment address (main.py:115-161);
- asset natural key = fingerprint; the insert carries the *first* row's
  wallet as current_wallet_id (main.py:204-224, 274-289);
- only non-mint rows of an already-known asset overwrite
  current_wallet_id (main.py:290-294);
- asset_ext.id mirrors asset_id; latest_mint_tx_id tracks positive
  mints only (burns excluded, main.py:226-248); latest_tx_id tracks
  every transfer row (main.py:296-315);
- hex_to_string: NUL→space, UTF-8 decode, hex fallback (misc.py:15-23).
  The reference also doubles single quotes, but that is SQL-injection
  escaping consumed by its string-spliced INSERT — the *stored* value
  keeps the single quote, which is what we replicate.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import duckdb

from ..functions.cardano import staking_address
from .fixtures import GENESIS, pg_escape


def hex_to_string_py(hex_string: str) -> str:
    try:
        raw = bytearray.fromhex(hex_string)
        raw = raw.replace(b"\x00", b" ")
        return raw.decode()
    except UnicodeDecodeError:
        return hex_string


def extract_records(source_dir: str, lo: datetime, hi: datetime) -> list[dict]:
    con = duckdb.connect()
    for t in (
        "block",
        "tx",
        "tx_out",
        "ma_tx_out",
        "ma_tx_mint",
        "multi_asset",
        "stake_address",
        "tx_metadata",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(source_dir, t + '.parquet')}'"
        )
    sql = """
    WITH all_ma_tx AS (
      SELECT mtm.ident AS ma_id, ma.policy AS policy_raw, ma.name AS name_raw,
             ma.fingerprint, mtm.quantity, mtm.tx_id,
             CAST(NULL AS VARCHAR) AS address, CAST(NULL AS VARCHAR) AS stake_address,
             0 AS leg_order, CAST(-1 AS BIGINT) AS sub_id
      FROM ma_tx_mint mtm
      JOIN tx t ON t.id = mtm.tx_id
      JOIN block b ON b.id = t.block_id
      JOIN multi_asset ma ON ma.id = mtm.ident
      WHERE mtm.quantity < 0 AND b."time" > ? AND b."time" <= ?
      UNION ALL
      SELECT mto.ident, ma2.policy, ma2.name, ma2.fingerprint, mto.quantity,
             to2.tx_id, to2.address, sa."view",
             1 AS leg_order, to2.id AS sub_id
      FROM ma_tx_out mto
      JOIN tx_out to2 ON mto.tx_out_id = to2.id
      JOIN tx t2 ON to2.tx_id = t2.id
      JOIN block b2 ON t2.block_id = b2.id
      JOIN multi_asset ma2 ON ma2.id = mto.ident
      LEFT JOIN stake_address sa ON to2.stake_address_id = sa.id
      WHERE b2."time" > ? AND b2."time" <= ?
    )
    SELECT amt.*, lower(hex(t3.hash)) AS tx_hash, b3."time" AS tx_time,
           mm.is_mint_tx, mm.json
    FROM all_ma_tx amt
    LEFT JOIN (
      SELECT m.ident, m.tx_id, TRUE AS is_mint_tx, tm.json
      FROM ma_tx_mint m
      LEFT JOIN (SELECT tx_id, json FROM tx_metadata WHERE "key" = 721) tm
        ON tm.tx_id = m.tx_id
    ) mm ON mm.ident = amt.ma_id AND mm.tx_id = amt.tx_id
    JOIN tx t3 ON amt.tx_id = t3.id
    JOIN block b3 ON t3.block_id = b3.id
    ORDER BY b3."time" ASC, amt.tx_id ASC, amt.ma_id ASC, amt.leg_order ASC, amt.sub_id ASC
    """
    res = con.execute(sql, [lo, hi, lo, hi])
    cols = [d[0] for d in res.description]
    return [dict(zip(cols, row)) for row in res.fetchall()]


def cardano_tip(source_dir: str, buffer_blocks: int = 3) -> datetime | None:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT \"time\" FROM '{os.path.join(source_dir, 'block.parquet')}' "
        f"ORDER BY \"time\" DESC LIMIT 1 OFFSET {buffer_blocks}"
    ).fetchall()
    return rows[0][0] if rows else None


def _mini(obj) -> str | None:
    return None if obj is None else json.dumps(obj, separators=(",", ":"))


def replay(source_dir: str, lo: datetime | None = None, hi: datetime | None = None) -> dict[str, list[tuple]]:
    """Run the loop over the full (or given) range; returns the six
    target tables as lists of tuples in engine column order."""
    lo = lo or GENESIS
    hi = hi or cardano_tip(source_dir)
    records = extract_records(source_dir, lo, hi)

    wallets: dict[str, int] = {}
    collections: dict[str, int] = {}
    assets: dict[str, int] = {}
    wallet_rows, collection_rows = [], []
    asset_rows: dict[int, list] = {}
    ext: dict[int, list] = {}  # asset_id -> [latest_mint_tx_id, latest_tx_id]
    mint_rows, tx_rows = [], []
    idx_wallet = idx_collection = idx_asset = idx_mint = idx_tx = 1

    for r in records:
        policy_id = bytes(r["policy_raw"]).hex()
        name_raw = bytes(r["name_raw"])
        name_hash = name_raw.hex()
        address = r["address"]

        if address is not None:
            stake = staking_address(address)
            key = stake if stake is not None else address
            if key not in wallets:
                wallets[key] = idx_wallet
                wallet_rows.append(
                    (idx_wallet, key, "STAKE" if stake is not None else "ENTERPRISE")
                )
                idx_wallet += 1
            wallet_id = wallets[key]
        else:
            wallet_id = None  # burn rows

        if policy_id not in collections:
            collections[policy_id] = idx_collection
            collection_rows.append((idx_collection, policy_id))
            idx_collection += 1
        collection_id = collections[policy_id]

        fp = r["fingerprint"]
        is_mint = r["is_mint_tx"] is True

        if fp not in assets:
            assets[fp] = idx_asset
            asset_rows[idx_asset] = [
                idx_asset,
                collection_id,
                f"{policy_id}.{name_hash}",
                hex_to_string_py(name_hash),
                fp,
                wallet_id,
            ]
            idx_asset += 1
            asset_known_before = False
        else:
            asset_known_before = True
        asset_id = assets[fp]

        qty = r["quantity"]
        if is_mint:
            # CIP-25 metadata via the dynamic JSON path (json->policy->name)
            image = metadata = files = None
            if r["json"] is not None:
                doc = json.loads(r["json"])
                meta = doc.get(policy_id, {}).get(pg_escape(name_raw))
                if meta is not None:
                    image = meta.get("image")
                    metadata = _mini(meta)
                    files = _mini(meta.get("files")) if "files" in meta else None
            if qty > 0:
                ext.setdefault(asset_id, [None, None])[0] = idx_mint
            mint_rows.append(
                (idx_mint, asset_id, wallet_id, qty, r["tx_hash"], r["tx_time"], image, metadata, files)
            )
            idx_mint += 1
        else:
            if asset_known_before:
                asset_rows[asset_id][5] = wallet_id  # current_wallet_id overwrite
            ext.setdefault(asset_id, [None, None])[1] = idx_tx
            tx_rows.append((idx_tx, asset_id, wallet_id, qty, r["tx_hash"], r["tx_time"]))
            idx_tx += 1

    ext_rows = [
        (aid, aid, v[0], v[1]) for aid, v in sorted(ext.items())
    ]
    return {
        "wallet": wallet_rows,
        "collection": collection_rows,
        "asset": [tuple(v) for v in asset_rows.values()],
        "asset_tx": tx_rows,
        "asset_mint_tx": mint_rows,
        "asset_ext": ext_rows,
    }
