"""Staking-address derivation against CIP-19's published test vectors.

These expected strings come straight from the CIP-19 spec's mainnet test
vectors (the "test vectors" appendix), NOT from this repo's own encoder,
so this test can catch derivation bugs that a self-referential golden
oracle cannot. The underlying hashes are the spec's too:

  payment key hash  9493315cd92eb5d8c4304e67b7e16ae36d61d34502694657811a2c8e
  script hash       c37b1b5dc0669f1d3c61a6fddb2e8fde96be87b881c60bce8e8d542f
  stake key hash    337b62cfff6403a06a3acbc34f8c46003c69fe79a3628cefa9c47251

Reference behavior being matched: /root/reference/app/cardano.py:12-27
returns a mainnet stake address iff pycardano's ``staking_part`` is a
``VerificationKeyHash`` — true for CIP-19 header types 0 and 1, false
for 2/3 (script delegation), 6/7 (no delegation), and Byron.
"""

from __future__ import annotations

import pytest

from pantasia_db_sync_spark.functions.cardano import (
    bech32_decode,
    staking_address,
)

PAY_KH = "9493315cd92eb5d8c4304e67b7e16ae36d61d34502694657811a2c8e"
SCRIPT_H = "c37b1b5dc0669f1d3c61a6fddb2e8fde96be87b881c60bce8e8d542f"
STAKE_KH = "337b62cfff6403a06a3acbc34f8c46003c69fe79a3628cefa9c47251"

STAKE_VEC = "stake1uyehkck0lajq8gr28t9uxnuvgcqrc6070x3k9r8048z8y5gh6ffgw"

# header type -> (CIP-19 mainnet address vector, expected payment-part
# hash, expected delegation-part hash or None)
VECTORS = {
    0: (
        "addr1qx2fxv2umyhttkxyxp8x0dlpdt3k6cwng5pxj3jhsydzer"
        "3n0d3vllmyqwsx5wktcd8cc3sq835lu7drv2xwl2wywfgse35a3x",
        PAY_KH,
        STAKE_KH,
    ),
    1: (
        "addr1z8phkx6acpnf78fuvxn0mkew3l0fd058hzquvz7w36x4gt"
        "en0d3vllmyqwsx5wktcd8cc3sq835lu7drv2xwl2wywfgs9yc0hh",
        SCRIPT_H,
        STAKE_KH,
    ),
    2: (
        "addr1yx2fxv2umyhttkxyxp8x0dlpdt3k6cwng5pxj3jhsydzer"
        "kr0vd4msrxnuwnccdxlhdjar77j6lg0wypcc9uar5d2shs2z78ve",
        PAY_KH,
        SCRIPT_H,
    ),
    3: (
        "addr1x8phkx6acpnf78fuvxn0mkew3l0fd058hzquvz7w36x4gt"
        "7r0vd4msrxnuwnccdxlhdjar77j6lg0wypcc9uar5d2shskhj42g",
        SCRIPT_H,
        SCRIPT_H,
    ),
    6: (
        "addr1vx2fxv2umyhttkxyxp8x0dlpdt3k6cwng5pxj3jhsydzers66hrl8",
        PAY_KH,
        None,
    ),
}


@pytest.mark.parametrize("hdr_type", sorted(VECTORS))
def test_vector_decodes_to_spec_hashes(hdr_type):
    """Cross-validate our bech32 decoder against the spec: each vector's
    checksum must verify and its payload must be exactly the spec's
    header + payment hash (+ delegation hash)."""
    addr, pay_hex, deleg_hex = VECTORS[hdr_type]
    decoded = bech32_decode(addr)
    assert decoded is not None, "checksum failed — vector corrupt"
    hrp, payload = decoded
    assert hrp == "addr"
    assert payload[0] >> 4 == hdr_type
    assert payload[0] & 0x0F == 1  # mainnet network id
    assert payload[1:29].hex() == pay_hex
    if deleg_hex is None:
        assert len(payload) == 29
    else:
        assert payload[29:57].hex() == deleg_hex


def test_keyhash_delegation_yields_stake_address():
    # Types 0 and 1 both delegate to a stake *key* hash -> reward addr.
    assert staking_address(VECTORS[0][0]) == STAKE_VEC
    assert staking_address(VECTORS[1][0]) == STAKE_VEC


def test_script_delegation_and_enterprise_yield_none():
    # Types 2/3 delegate to a *script* hash; pycardano's staking_part is
    # a ScriptHash, so the reference returns None. Type 6 has no
    # delegation part at all.
    assert staking_address(VECTORS[2][0]) is None
    assert staking_address(VECTORS[3][0]) is None
    assert staking_address(VECTORS[6][0]) is None


def test_byron_and_garbage_yield_none():
    assert staking_address("Ae2tdPwUPEZ3deadbeef") is None
    assert staking_address(None) is None
    assert staking_address("addr1qqqqqnotvalidchecksum") is None


def test_stake_vector_roundtrip():
    decoded = bech32_decode(STAKE_VEC)
    assert decoded is not None
    hrp, payload = decoded
    assert hrp == "stake"
    assert payload[0] == 0xE1  # reward account, key hash, mainnet
    assert payload[1:].hex() == STAKE_KH
