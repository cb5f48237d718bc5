"""Cardano address handling: bech32 codec + staking-address derivation.

Re-expresses ``get_staking_address`` (/root/reference/app/cardano.py:12-27),
the reference's only irreducible UDF (SURVEY.md §2.H1). The reference
uses pycardano; since that is not available here, this is a minimal
pure-Python implementation of the public formats it relies on:

- bech32 (BIP-173 polymod/charset — public algorithm) without the
  90-char length cap (Cardano payment addresses exceed it);
- CIP-19 Shelley address headers: type nibble in bits 7-4 of byte 0.
  Types 0-3 carry a delegation (staking) part in bytes 29-56; the
  reference only re-encodes it when it is a *key* hash (types 0/1 —
  pycardano's ``VerificationKeyHash`` check; types 2/3 carry a script
  hash there), yielding the mainnet reward address header 0xe1 with
  hrp ``stake``. Verified against CIP-19's published test vectors in
  tests/test_cardano_vectors.py.

Spark surface: a vectorized pandas UDF (Arrow-batched) — the one place
Python touches the hot path, exactly as the survey prescribes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
_GEN = (0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3)


def _polymod(values: list[int]) -> int:
    chk = 1
    for v in values:
        top = chk >> 25
        chk = (chk & 0x1FFFFFF) << 5 ^ v
        for i in range(5):
            chk ^= _GEN[i] if ((top >> i) & 1) else 0
    return chk


def _hrp_expand(hrp: str) -> list[int]:
    return [ord(x) >> 5 for x in hrp] + [0] + [ord(x) & 31 for x in hrp]


def _convertbits(data: bytes | list[int], frombits: int, tobits: int, pad: bool) -> list[int] | None:
    acc = 0
    bits = 0
    ret = []
    maxv = (1 << tobits) - 1
    for value in data:
        acc = (acc << frombits) | value
        bits += frombits
        while bits >= tobits:
            bits -= tobits
            ret.append((acc >> bits) & maxv)
    if pad:
        if bits:
            ret.append((acc << (tobits - bits)) & maxv)
    elif bits >= frombits or ((acc << (tobits - bits)) & maxv):
        return None
    return ret


def bech32_encode(hrp: str, payload: bytes) -> str:
    data = _convertbits(payload, 8, 5, True)
    combined = data + _checksum(hrp, data)
    return hrp + "1" + "".join(_CHARSET[d] for d in combined)


def _checksum(hrp: str, data: list[int]) -> list[int]:
    values = _hrp_expand(hrp) + data
    polymod = _polymod(values + [0, 0, 0, 0, 0, 0]) ^ 1
    return [(polymod >> 5 * (5 - i)) & 31 for i in range(6)]


def bech32_decode(addr: str) -> tuple[str, bytes] | None:
    if "1" not in addr:
        return None
    pos = addr.rfind("1")
    hrp, data_part = addr[:pos], addr[pos + 1 :]
    try:
        data = [_CHARSET.index(c) for c in data_part]
    except ValueError:
        return None
    if _polymod(_hrp_expand(hrp) + data) != 1:
        return None
    payload = _convertbits(data[:-6], 5, 8, False)
    if payload is None:
        return None
    return hrp, bytes(payload)


# CIP-19 header types whose delegation part is a stake *key* hash.
# Per CIP-19's header table, types 0 (payment keyhash) and 1 (payment
# scripthash) both carry a StakeKeyHash delegation part; types 2/3 carry
# a script hash there, for which the reference (pycardano
# ``type(staking_part) is VerificationKeyHash``) returns None.
_KEYHASH_DELEGATION_TYPES = {0, 1}
MAINNET_STAKE_HEADER = 0xE1  # reward account, key hash, mainnet


def staking_address(address: str | None) -> str | None:
    """Stake (reward) address derived from a Shelley payment address, or
    None — same branch structure as the reference: non-``addr`` prefixes
    (Byron) and addresses without a stake-key part return None."""
    if address is None or not address.startswith("addr"):
        return None
    decoded = bech32_decode(address)
    if decoded is None:
        return None
    _, payload = decoded
    if len(payload) != 57:  # header + 28-byte payment part + 28-byte delegation part
        return None
    header_type = payload[0] >> 4
    if header_type not in _KEYHASH_DELEGATION_TYPES:
        return None
    stake_hash = payload[29:57]
    return bech32_encode("stake", bytes([MAINNET_STAKE_HEADER]) + stake_hash)


@pandas_udf(StringType())
def staking_address_udf(addresses: pd.Series) -> pd.Series:
    return addresses.map(staking_address, na_action="ignore")
