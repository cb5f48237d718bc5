"""Deterministic cardano-shaped fixture generator (FIXTURES.md §2).

Generates the eight source tables the extraction query reads, with the
value distributions the reference's branches need: Shelley base
addresses (stake part → STAKE wallets, several payment addresses per
stake key to exercise dedup), enterprise and Byron-style addresses,
burns (negative quantities), >int64 quantities (DecimalType proof),
asset names with NUL bytes / invalid UTF-8 (hex_to_string fallback),
and CIP-25 label-721 metadata keyed by the actual policy/name.

Written with pyarrow directly (no Spark needed) — seed-deterministic.
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timedelta
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.cardano import bech32_encode

GENESIS = datetime(2021, 3, 1, 21, 47, 0)
BLOCK_SPACING_S = 20


def _h(seed: str, n: int) -> bytes:
    """Deterministic n bytes from a string seed."""
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return out[:n]


def pg_escape(raw: bytes) -> str:
    """Postgres ``encode(bytea, 'escape')``: printable ASCII (except
    backslash) literal; backslash doubled; other bytes as \\ooo octal."""
    parts = []
    for b in raw:
        if b == 0x5C:
            parts.append("\\\\")
        elif 0x20 <= b <= 0x7E:
            parts.append(chr(b))
        else:
            parts.append("\\%03o" % b)
    return "".join(parts)


def generate(out_dir: str, scale: float = 1.0, seed: int = 42) -> dict[str, int]:
    """Write the eight source tables as parquet; returns row counts.

    scale=1.0 ≈ FIXTURES.md sf0.01 cardinalities.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    n_block = max(50, int(10_000 * scale))
    n_tx = max(150, int(30_000 * scale))
    n_asset = max(40, int(5_000 * scale))
    n_policy = max(5, n_asset // 10)
    n_stake = max(20, int(2_000 * scale))
    n_mint = max(60, int(8_000 * scale))
    n_transfer = max(100, int(32_000 * scale))

    counts: dict[str, int] = {}

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = table.num_rows

    # --- block / tx ---------------------------------------------------------
    block_times = [GENESIS + timedelta(seconds=BLOCK_SPACING_S * i) for i in range(n_block)]
    write(
        "block",
        pa.table(
            {"id": pa.array(range(1, n_block + 1), pa.int64()), "time": pa.array(block_times)}
        ),
    )
    tx_block = [1 + (i * n_block) // n_tx for i in range(n_tx)]
    write(
        "tx",
        pa.table(
            {
                "id": pa.array(range(1, n_tx + 1), pa.int64()),
                "hash": pa.array([_h(f"tx{i}", 32) for i in range(1, n_tx + 1)], pa.binary()),
                "block_id": pa.array(tx_block, pa.int64()),
            }
        ),
    )

    # --- multi_asset --------------------------------------------------------
    policies = [_h(f"policy{p}", 28) for p in range(n_policy)]
    ma_policy, ma_name, ma_fp = [], [], []
    for i in range(1, n_asset + 1):
        ma_policy.append(policies[rng.integers(0, n_policy)])
        kind = rng.random()
        if kind < 0.80:
            name = f"Token {i}".encode()
        elif kind < 0.90:
            name = f"Tok{i}\x00gap".encode()  # NUL byte → space in hex_to_string
        elif kind < 0.95:
            name = b"\xff\xfe" + f"bad{i}".encode()  # invalid UTF-8 → hex fallback
        else:
            name = f"Tokén {i}".encode()  # multi-byte UTF-8
        ma_name.append(name)
        ma_fp.append("asset1" + _h(f"fp{i}", 20).hex())
    write(
        "multi_asset",
        pa.table(
            {
                "id": pa.array(range(1, n_asset + 1), pa.int64()),
                "policy": pa.array(ma_policy, pa.binary()),
                "name": pa.array(ma_name, pa.binary()),
                "fingerprint": pa.array(ma_fp, pa.string()),
            }
        ),
    )

    # --- stake_address + payment address pool -------------------------------
    stake_hashes = [_h(f"stake{s}", 28) for s in range(1, n_stake + 1)]
    stake_views = [
        bech32_encode("stake", bytes([0xE1]) + h) for h in stake_hashes
    ]
    write(
        "stake_address",
        pa.table(
            {
                "id": pa.array(range(1, n_stake + 1), pa.int64()),
                "view": pa.array(stake_views, pa.string()),
            }
        ),
    )

    n_addr_pool = max(60, n_stake * 3)
    pool_addr: list[str] = []
    pool_stake_id: list[int | None] = []
    for a in range(n_addr_pool):
        kind = rng.random()
        if kind < 0.50:
            # base address (type 0, mainnet): payment part unique, stake
            # part shared — multiple payment addresses → one wallet
            sid = int(rng.integers(1, n_stake + 1))
            payload = bytes([0x01]) + _h(f"pay{a}", 28) + stake_hashes[sid - 1]
            pool_addr.append(bech32_encode("addr", payload))
            pool_stake_id.append(sid)
        elif kind < 0.58:
            # type 1 (script payment part, stake KEY delegation): still
            # derives a stake address per CIP-19 / pycardano
            sid = int(rng.integers(1, n_stake + 1))
            payload = bytes([0x11]) + _h(f"scr{a}", 28) + stake_hashes[sid - 1]
            pool_addr.append(bech32_encode("addr", payload))
            pool_stake_id.append(sid)
        elif kind < 0.64:
            # type 2 (key payment part, SCRIPT delegation): the reference
            # returns None for script staking parts -> enterprise-like
            payload = bytes([0x21]) + _h(f"pay{a}", 28) + _h(f"dscr{a}", 28)
            pool_addr.append(bech32_encode("addr", payload))
            pool_stake_id.append(None)
        elif kind < 0.68:
            # type 3 (script payment, script delegation): also None
            payload = bytes([0x31]) + _h(f"scr{a}", 28) + _h(f"dscr{a}", 28)
            pool_addr.append(bech32_encode("addr", payload))
            pool_stake_id.append(None)
        elif kind < 0.85:
            # enterprise address (type 6): no stake part
            payload = bytes([0x61]) + _h(f"ent{a}", 28)
            pool_addr.append(bech32_encode("addr", payload))
            pool_stake_id.append(None)
        else:
            # Byron-style (non-bech32, non-'addr' prefix)
            pool_addr.append("Ae2tdPwUPE" + _h(f"byron{a}", 16).hex())
            pool_stake_id.append(None)

    # --- mints/burns, outputs, transfers ------------------------------------
    mint_ident, mint_qty, mint_tx = [], [], []
    out_rows: list[tuple[int, Decimal, int, int]] = []  # (ident, qty, tx_id, addr_idx)
    meta_by_tx: dict[int, dict] = {}  # merged CIP-25 doc per tx (one 721 row per tx)
    other_meta_txs: list[int] = []

    seen_mint_pairs: set[tuple[int, int]] = set()
    for m in range(n_mint):
        ident = int(rng.integers(1, n_asset + 1))
        tx_id = int(rng.integers(1, n_tx + 1))
        if (ident, tx_id) in seen_mint_pairs:  # keep (ident, tx_id) unique
            continue
        seen_mint_pairs.add((ident, tx_id))
        is_burn = rng.random() < 0.10
        if is_burn:
            qty = Decimal(-int(rng.integers(1, 5)))
        elif rng.random() < 0.02:
            qty = Decimal(10**19) + Decimal(m)  # > int64 max
        else:
            qty = Decimal(int(rng.integers(1, 3)))
        mint_ident.append(ident)
        mint_qty.append(qty)
        mint_tx.append(tx_id)
        if qty > 0:
            # mint output lands in the same tx
            addr_idx = int(rng.integers(0, n_addr_pool))
            out_rows.append((ident, qty, tx_id, addr_idx))
            # CIP-25 metadata for ~60% of mints, merged into one 721 doc per tx
            name = ma_name[ident - 1]
            esc = pg_escape(name)
            if rng.random() < 0.60:
                policy_hex = ma_policy[ident - 1].hex()
                meta: dict = {"image": f"ipfs://img{ident}", "artist": f"artist{ident % 7}"}
                if rng.random() < 0.5:
                    meta["files"] = [{"src": f"ipfs://f{ident}", "mediaType": "image/png"}]
                meta_by_tx.setdefault(tx_id, {}).setdefault(policy_hex, {})[esc] = meta
            if rng.random() < 0.05:
                other_meta_txs.append(tx_id)

    for _ in range(n_transfer):
        ident = int(n_asset * (rng.random() ** 2)) + 1  # zipf-ish hot head
        tx_id = int(rng.integers(1, n_tx + 1))
        addr_idx = int(rng.integers(0, n_addr_pool))
        qty = Decimal(int(rng.integers(1, 3)))
        out_rows.append((ident, qty, tx_id, addr_idx))

    write(
        "ma_tx_mint",
        pa.table(
            {
                "ident": pa.array(mint_ident, pa.int64()),
                "quantity": pa.array(mint_qty, pa.decimal128(20, 0)),
                "tx_id": pa.array(mint_tx, pa.int64()),
            }
        ),
    )

    # tx_out: one per out_row (plus its ma_tx_out linking row)
    to_id, to_tx, to_addr, to_sid = [], [], [], []
    mto_ident, mto_qty, mto_out = [], [], []
    for i, (ident, qty, tx_id, addr_idx) in enumerate(out_rows, start=1):
        to_id.append(i)
        to_tx.append(tx_id)
        to_addr.append(pool_addr[addr_idx])
        to_sid.append(pool_stake_id[addr_idx])
        mto_ident.append(ident)
        mto_qty.append(qty)
        mto_out.append(i)
    write(
        "tx_out",
        pa.table(
            {
                "id": pa.array(to_id, pa.int64()),
                "tx_id": pa.array(to_tx, pa.int64()),
                "address": pa.array(to_addr, pa.string()),
                "stake_address_id": pa.array(to_sid, pa.int64()),
            }
        ),
    )
    write(
        "ma_tx_out",
        pa.table(
            {
                "ident": pa.array(mto_ident, pa.int64()),
                "quantity": pa.array(mto_qty, pa.decimal128(20, 0)),
                "tx_out_id": pa.array(mto_out, pa.int64()),
            }
        ),
    )
    meta_rows = [
        (tx_id, 721, json.dumps(doc)) for tx_id, doc in sorted(meta_by_tx.items())
    ] + [(tx_id, 674, json.dumps({"msg": ["unrelated"]})) for tx_id in other_meta_txs]
    write(
        "tx_metadata",
        pa.table(
            {
                "tx_id": pa.array([r[0] for r in meta_rows], pa.int64()),
                "key": pa.array([r[1] for r in meta_rows], pa.int64()),
                "json": pa.array([r[2] for r in meta_rows], pa.string()),
            }
        ),
    )
    return counts
