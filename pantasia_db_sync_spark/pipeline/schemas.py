"""Schema constants: cardano-db-sync source tables (as used by the
extraction query) and the pantasia target tables.

Source columns are exactly those the reference's SQL touches
(/root/reference/app/db/postgres.py:327-402; FIXTURES.md §2); target
DDL transposed from ``app/db/postgres.py:94-154`` per the SURVEY.md
§1.5 type mapping (serial→int/long, numeric(20,0)→decimal, jsonb→
JSON string, bytea→binary).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple[str, object, bool]) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


QUANTITY = DecimalType(20, 0)

# --- source (cardano-db-sync) ------------------------------------------------

BLOCK = _s(("id", LongType(), False), ("time", TimestampType(), False))
TX = _s(
    ("id", LongType(), False),
    ("hash", BinaryType(), False),
    ("block_id", LongType(), False),
)
TX_OUT = _s(
    ("id", LongType(), False),
    ("tx_id", LongType(), False),
    ("address", StringType(), False),
    ("stake_address_id", LongType(), True),
)
MA_TX_OUT = _s(
    ("ident", LongType(), False),
    ("quantity", QUANTITY, False),
    ("tx_out_id", LongType(), False),
)
MA_TX_MINT = _s(
    ("ident", LongType(), False),
    ("quantity", QUANTITY, False),
    ("tx_id", LongType(), False),
)
MULTI_ASSET = _s(
    ("id", LongType(), False),
    ("policy", BinaryType(), False),
    ("name", BinaryType(), False),
    ("fingerprint", StringType(), False),
)
STAKE_ADDRESS = _s(("id", LongType(), False), ("view", StringType(), False))
TX_METADATA = _s(
    ("tx_id", LongType(), False),
    ("key", LongType(), False),
    ("json", StringType(), False),
)

SOURCE_SCHEMAS: dict[str, StructType] = {
    "block": BLOCK,
    "tx": TX,
    "tx_out": TX_OUT,
    "ma_tx_out": MA_TX_OUT,
    "ma_tx_mint": MA_TX_MINT,
    "multi_asset": MULTI_ASSET,
    "stake_address": STAKE_ADDRESS,
    "tx_metadata": TX_METADATA,
}

# --- target (pantasia) -------------------------------------------------------

# ``user`` is app-owned: the reference bootstraps it (DDL at
# app/db/postgres.py:96-103) but the sync loop never writes a row.
# Declared (and bootstrapped empty) here for DDL-surface parity.
USER = _s(
    ("id", IntegerType(), False),
    ("pfp_asset_id", LongType(), True),
    ("alias", StringType(), False),
    ("created_on", TimestampType(), False),
    ("modified", TimestampType(), False),
    ("last_login", TimestampType(), True),
)
WALLET = _s(
    ("id", LongType(), False),
    ("address", StringType(), False),
    ("address_type", StringType(), False),  # 'ENTERPRISE' | 'STAKE'
    ("user_id", IntegerType(), True),  # app-owned; sync writes NULL
)
COLLECTION = _s(
    ("id", LongType(), False),
    ("policy_id", StringType(), False),
    ("name", StringType(), True),  # app-owned; sync writes NULL
)
ASSET = _s(
    ("id", LongType(), False),
    ("collection_id", LongType(), False),
    ("hash", StringType(), False),  # policy_hex '.' name_hex
    ("name", StringType(), True),
    ("fingerprint", StringType(), False),
    ("current_wallet_id", LongType(), True),
)
ASSET_TX = _s(
    ("id", LongType(), False),
    ("asset_id", LongType(), False),
    ("wallet_id", LongType(), True),
    ("quantity", QUANTITY, False),
    ("tx_hash", StringType(), False),
    ("tx_time", TimestampType(), False),
)
ASSET_MINT_TX = _s(
    ("id", LongType(), False),
    ("asset_id", LongType(), False),
    ("wallet_id", LongType(), True),  # NULL for burns
    ("quantity", QUANTITY, False),
    ("tx_hash", StringType(), False),
    ("tx_time", TimestampType(), False),
    ("image", StringType(), True),
    ("metadata", StringType(), True),  # JSON text
    ("files", StringType(), True),  # JSON text
)
ASSET_EXT = _s(
    ("id", LongType(), False),  # mirrors asset_id (reference semantics)
    ("asset_id", LongType(), False),
    ("latest_mint_tx_id", LongType(), True),
    ("latest_tx_id", LongType(), True),
)

# Append-only tables (per-period commit partitions, read via
# store.read_facts); everything else is a versioned dim. Single source
# of truth for sync.py and integrity.py dispatch.
FACT_TABLES = ("asset_tx", "asset_mint_tx")

TARGET_SCHEMAS: dict[str, StructType] = {
    "user": USER,
    "wallet": WALLET,
    "collection": COLLECTION,
    "asset": ASSET,
    "asset_tx": ASSET_TX,
    "asset_mint_tx": ASSET_MINT_TX,
    "asset_ext": ASSET_EXT,
}

# Foreign-key graph, transposed 1:1 from the reference's
# ``pantasia_create_fk`` (app/db/postgres.py:214-244):
# (child table, child column, parent table, parent column).
FOREIGN_KEYS: list[tuple[str, str, str, str]] = [
    ("asset", "collection_id", "collection", "id"),
    ("asset", "current_wallet_id", "wallet", "id"),
    ("asset_mint_tx", "asset_id", "asset", "id"),
    ("asset_mint_tx", "wallet_id", "wallet", "id"),
    ("asset_tx", "asset_id", "asset", "id"),
    ("asset_tx", "wallet_id", "wallet", "id"),
    ("asset_ext", "asset_id", "asset", "id"),
    ("asset_ext", "latest_mint_tx_id", "asset_mint_tx", "id"),
    ("asset_ext", "latest_tx_id", "asset_tx", "id"),
    ("wallet", "user_id", "user", "id"),
]
