"""Clean-room H.264/AVC BASELINE-INTRA decoder + fixture encoder —
pure Python, zero native libs, built from the PUBLIC ITU-T H.264 /
ISO/IEC 14496-10 specification (clause numbers cited inline).

Scope (the honest gate, narrowed from "no H.264 at all" in round 14):

* DECODES: IDR / I slices, CAVLC entropy coding, Intra_16x16 luma
  prediction (all four modes: Vertical, Horizontal, DC, Plane), intra
  chroma prediction (DC / Horizontal / Vertical / Plane, 4:2:0),
  I_PCM macroblocks, the 4x4 integer inverse core transform, the luma
  DC 4x4 inverse Hadamard and the chroma DC 2x2 transform with the
  spec's exact dequantization ladders, frame cropping, and both NAL
  framings (Annex-B start codes and MP4/avcC length-prefixed) with
  emulation-prevention removal.
* DECODES (round-15 second pass): I_NxN / Intra_4x4 macroblocks —
  all nine per-4x4 prediction modes, the 8.3.1.1 most-probable-mode
  derivation, the Table 9-4 me(v) coded_block_pattern, per-8x8-group
  residual gating with full-block 8.5.12.1 dequant.
* DECODES (round-16 third pass): all four CAVLC coeff_token contexts
  — 0 <= nC < 2, 2 <= nC < 4, 4 <= nC < 8 (dense textured
  neighbors), chroma-DC, and the nC >= 8 fixed-length form — so
  multi-coefficient blocks with live nC bookkeeping parse end to end;
  the clause 8.7 IN-LOOP DEBLOCKING FILTER (all strengths 4/3/2/1/0,
  Tables 8-16/8-17, strong/weak luma + chroma shapes, per-MB QP
  averaging, slice alpha/beta offsets), so conformant streams that do
  NOT signal disable_deblocking_filter_idc=1 decode bit-exact; and
  P SLICES (clause 8.4) — P_Skip runs, P_L0_16x16, 16x8/8x16
  partitions, P_8x8 sub-partitions (all four Table 7-17 shapes down
  to 4x4), intra islands, the 6-tap half-pel + quarter-pel averaging
  luma interpolation, 1/8-pel bilinear chroma, the 8.4.1.3 median mv
  prediction, the Table 9-4 inter CBP column, and MULTIPLE REFERENCE
  FRAMES (sliding-window list, te() ref_idx per partition / per
  8x8, per-partition reference pick in MC and mvp matching) and
  EXPLICIT WEIGHTED PREDICTION (pred_weight_table, the 8.4.2.3.2
  weighted-sample formula — fades) — the IPPP GOP shape real
  baseline streams use; and
  MULTI-SLICE PICTURES — contiguous raster slices with the 6.4.8
  other-slice availability cut for intra prediction / nC / motion
  prediction, per-slice deblocking parameters, and the idc-2
  slice-boundary edge skip.
* RAISES NotImplementedError (each a deliberate, documented gate):
  CABAC (PPS entropy_coding_mode_flag=1 — its ~400 context-init
  pairs have no faithfully-reproducible public-memory source in this
  environment; a self-consistent-but-wrong table set would pass
  round-trip tests and silently corrupt real streams, so the gate
  stays honest), B slices, reference-picture list modification /
  adaptive marking (MMCO), Intra_8x8 / the
  8x8 transform (High profile), FMO/ASO (non-contiguous slice
  groups), interlace (frame_mbs_only_flag=0).
* RAISES ValueError: malformed bitstreams (the module-wide contract
  decode_mp4_samples relies on — a corrupt row skips, the Arrow batch
  survives).

Provenance: every table and formula below is transcribed from the
public spec text (Tables 9-5/9-7/9-9/9-10, clauses 7.3/8.3/8.5/9.2);
tests/test_properties.py pins prefix-freeness and encode/decode
round-trips over the complete codebooks, and pixel-exactness of the
full container->pixels chain for every gray 0..255. Reference
analogue: none (the reference daemon never touches media); this is
the training-data-pipeline extension surface — frame sampling for
vision corpora at 100 TB runs exactly this shape: Arrow-batched,
map-only, zero shuffle (see plans/llmdata.py
multimodal_mp4_avc_frames).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O over RBSP payloads
# ---------------------------------------------------------------------------


def nal_to_rbsp(nal: bytes) -> bytes:
    """Strip emulation-prevention bytes (7.4.1): 00 00 03 xx -> 00 00
    xx when xx <= 03."""
    out = bytearray()
    i, n = 0, len(nal)
    while i < n:
        if (
            i + 2 < n
            and nal[i] == 0
            and nal[i + 1] == 0
            and nal[i + 2] == 3
            and (i + 3 == n or nal[i + 3] <= 3)
        ):
            out += nal[i : i + 2]
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


def rbsp_to_nal(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes: any 00 00 followed by
    00/01/02/03 gets a 03 injected (7.4.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8
        # locate the rbsp_stop_one_bit (last set bit) for
        # more_rbsp_data (7.2)
        stop = -1
        for i in range(len(data) - 1, -1, -1):
            if data[i]:
                byte = data[i]
                low = 0
                while not (byte >> low) & 1:
                    low += 1
                stop = i * 8 + (7 - low)
                break
        self.stop_bit = stop

    def u(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("bitstream truncated")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        """Exp-Golomb unsigned (9.1)."""
        zeros = 0
        while True:
            if self.pos >= self.nbits:
                raise ValueError("bitstream truncated in exp-Golomb")
            if self.u(1):
                break
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-Golomb code too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        while self.pos & 7:
            if self.u(1):
                raise ValueError("nonzero alignment bit")

    def more_rbsp_data(self) -> bool:
        return 0 <= self.pos < self.stop_bit


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def put_str(self, s: str) -> None:
        self.bits.extend(1 if c == "1" else 0 for c in s)

    def ue(self, v: int) -> None:
        k = v + 1
        nbits = k.bit_length()
        self.u(nbits - 1, 0)
        self.u(nbits, k)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)
        while len(self.bits) & 7:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


# ---------------------------------------------------------------------------
# CAVLC codebooks (Tables 9-5, 9-7/9-8, 9-9(a), 9-10) — transcribed
# from the public spec. Key: (trailing_ones, total_coeff) -> bitstring.
# All four coeff_token contexts decode: ctx0 (0 <= nC < 2, the
# sparse-neighbor context), ctx1 (2 <= nC < 4) and ctx2 (4 <= nC < 8,
# dense textured neighbors — round 16), CTX_CHROMA_DC (nC == -1,
# 4:2:0 chroma DC, maxNumCoeff 4); nC >= 8 is the algorithmic 6-bit
# fixed-length form.
# ---------------------------------------------------------------------------

_COEFF_TOKEN_CTX0 = {
    (0, 0): "1",
    (0, 1): "000101", (1, 1): "01",
    (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
    (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101",
    (3, 3): "00011",
    (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101",
    (3, 4): "000011",
    (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101",
    (3, 5): "0000100",
    (0, 6): "0000000001111", (1, 6): "00000000110", (2, 6): "0000000101",
    (3, 6): "00000100",
    (0, 7): "0000000001011", (1, 7): "0000000001110", (2, 7): "00000000101",
    (3, 7): "000000100",
    (0, 8): "0000000001000", (1, 8): "0000000001010",
    (2, 8): "0000000001101", (3, 8): "0000000100",
    (0, 9): "00000000001111", (1, 9): "00000000001110",
    (2, 9): "0000000001001", (3, 9): "00000000100",
    (0, 10): "00000000001011", (1, 10): "00000000001010",
    (2, 10): "00000000001101", (3, 10): "0000000001100",
    (0, 11): "000000000001111", (1, 11): "000000000001110",
    (2, 11): "00000000001001", (3, 11): "00000000001000",
    (0, 12): "000000000001011", (1, 12): "000000000001010",
    (2, 12): "000000000001101", (3, 12): "000000000001100",
    (0, 13): "0000000000001111", (1, 13): "000000000000001",
    (2, 13): "000000000001001", (3, 13): "000000000001000",
    (0, 14): "0000000000001011", (1, 14): "0000000000001110",
    (2, 14): "0000000000001101", (3, 14): "0000000000001100",
    (0, 15): "0000000000000111", (1, 15): "0000000000001010",
    (2, 15): "0000000000001001", (3, 15): "0000000000001000",
    (0, 16): "0000000000000100", (1, 16): "0000000000000110",
    (2, 16): "0000000000000101", (3, 16): "0000000000000001",
}
# NOTE on provenance: the short rows (TotalCoeff <= 8) of this context
# are the extensively-published part of Table 9-5 and are what real
# intra streams and every fixture in this repo exercise; the deep tail
# (TotalCoeff >= 13 with nC < 2 — a 13+-coefficient block whose
# neighbors average < 2 coefficients) is reconstructed and pinned
# prefix-free + roundtrip-consistent by tests, with Kraft sum
# 1 - 5/65536.

# Table 9-5, 2 <= nC < 4 column (round 16): transcribed via the
# (length, value) form the reference-software tables publish — the
# same transcription reproduces the repo's independently-sourced ctx0
# above on all 62 entries, pinning the source. Prefix-freeness +
# Kraft sum pinned by tests alongside exhaustive encode/decode
# round-trips.
_COEFF_TOKEN_CTX1 = {
    (0, 0): "11",
    (0, 1): "001011", (1, 1): "10",
    (0, 2): "000111", (1, 2): "00111", (2, 2): "011",
    (0, 3): "0000111", (1, 3): "001010", (2, 3): "001001", (3, 3): "0101",
    (0, 4): "00000111", (1, 4): "000110", (2, 4): "000101", (3, 4): "0100",
    (0, 5): "00000100", (1, 5): "0000110", (2, 5): "0000101",
    (3, 5): "00110",
    (0, 6): "000000111", (1, 6): "00000110", (2, 6): "00000101",
    (3, 6): "001000",
    (0, 7): "00000001111", (1, 7): "000000110", (2, 7): "000000101",
    (3, 7): "000100",
    (0, 8): "00000001011", (1, 8): "00000001110", (2, 8): "00000001101",
    (3, 8): "0000100",
    (0, 9): "000000001111", (1, 9): "00000001010", (2, 9): "00000001001",
    (3, 9): "000000100",
    (0, 10): "000000001011", (1, 10): "000000001110",
    (2, 10): "000000001101", (3, 10): "00000001100",
    (0, 11): "000000001000", (1, 11): "000000001010",
    (2, 11): "000000001001", (3, 11): "00000001000",
    (0, 12): "0000000001111", (1, 12): "0000000001110",
    (2, 12): "0000000001101", (3, 12): "000000001100",
    (0, 13): "0000000001011", (1, 13): "0000000001010",
    (2, 13): "0000000001001", (3, 13): "0000000001100",
    (0, 14): "0000000000111", (1, 14): "00000000001011",
    (2, 14): "0000000000110", (3, 14): "0000000001000",
    (0, 15): "00000000001001", (1, 15): "00000000001000",
    (2, 15): "00000000001010", (3, 15): "0000000000001",
    (0, 16): "00000000000111", (1, 16): "00000000000110",
    (2, 16): "00000000000101", (3, 16): "00000000000100",
}

# Table 9-5, 4 <= nC < 8 column: same transcription route. The
# assembled code is prefix-free with Kraft sum exactly 1 - 1/1024
# (the single unused 10-bit leaf 0000000000) — pinned by tests.
_COEFF_TOKEN_CTX2 = {
    (0, 0): "1111",
    (0, 1): "001111", (1, 1): "1110",
    (0, 2): "001011", (1, 2): "01111", (2, 2): "1101",
    (0, 3): "001000", (1, 3): "01100", (2, 3): "01110", (3, 3): "1100",
    (0, 4): "0001111", (1, 4): "01010", (2, 4): "01011", (3, 4): "1011",
    (0, 5): "0001011", (1, 5): "01000", (2, 5): "01001", (3, 5): "1010",
    (0, 6): "0001001", (1, 6): "001110", (2, 6): "001101", (3, 6): "1001",
    (0, 7): "0001000", (1, 7): "001010", (2, 7): "001001", (3, 7): "1000",
    (0, 8): "00001111", (1, 8): "0001110", (2, 8): "0001101",
    (3, 8): "01101",
    (0, 9): "00001011", (1, 9): "00001110", (2, 9): "0001010",
    (3, 9): "001100",
    (0, 10): "000001111", (1, 10): "00001010", (2, 10): "00001101",
    (3, 10): "0001100",
    (0, 11): "000001011", (1, 11): "000001110", (2, 11): "00001001",
    (3, 11): "00001100",
    (0, 12): "000001000", (1, 12): "000001010", (2, 12): "000001101",
    (3, 12): "00001000",
    (0, 13): "0000001101", (1, 13): "000000111", (2, 13): "000001001",
    (3, 13): "000001100",
    (0, 14): "0000001001", (1, 14): "0000001100", (2, 14): "0000001011",
    (3, 14): "0000001010",
    (0, 15): "0000000101", (1, 15): "0000001000", (2, 15): "0000000111",
    (3, 15): "0000000110",
    (0, 16): "0000000001", (1, 16): "0000000100", (2, 16): "0000000011",
    (3, 16): "0000000010",
}

_COEFF_TOKEN_CHROMA_DC = {
    (0, 0): "01",
    (0, 1): "000111", (1, 1): "1",
    (0, 2): "000100", (1, 2): "000110", (2, 2): "001",
    (0, 3): "000011", (1, 3): "0000011", (2, 3): "0000010",
    (3, 3): "000101",
    (0, 4): "000010", (1, 4): "00000011", (2, 4): "00000010",
    (3, 4): "0000000",
}

# total_zeros for 4x4 blocks (Tables 9-7/9-8): _TOTAL_ZEROS_4x4[tc][tz]
_TOTAL_ZEROS_4x4 = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011",
        "0010", "00011", "00010", "000011", "000010", "000001",
        "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011",
        "0010", "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011",
        "011", "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011",
        "0010", "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001",
        "001", "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

# total_zeros for 4:2:0 chroma DC (Table 9-9a): maxNumCoeff 4
_TOTAL_ZEROS_CDC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# run_before (Table 9-10), zerosLeft 1..6; > 6 is algorithmic
_RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
}


def _invert(table: dict) -> dict:
    return {v: k for k, v in table.items()}


_CT0_DEC = _invert(_COEFF_TOKEN_CTX0)
_CT1_DEC = _invert(_COEFF_TOKEN_CTX1)
_CT2_DEC = _invert(_COEFF_TOKEN_CTX2)
_CTC_DEC = _invert(_COEFF_TOKEN_CHROMA_DC)


def _read_vlc(br: _BitReader, decode_map: dict, what: str):
    code = ""
    for _ in range(20):
        code += "1" if br.u(1) else "0"
        if code in decode_map:
            return decode_map[code]
    raise ValueError(f"invalid {what} VLC code {code!r}")


def _read_coeff_token(br: _BitReader, nC: int) -> tuple[int, int]:
    if nC == -1:
        return _read_vlc(br, _CTC_DEC, "chroma-DC coeff_token")
    if nC < 2:
        return _read_vlc(br, _CT0_DEC, "coeff_token")
    if nC < 4:
        return _read_vlc(br, _CT1_DEC, "coeff_token(2<=nC<4)")
    if nC < 8:
        return _read_vlc(br, _CT2_DEC, "coeff_token(4<=nC<8)")
    # nC >= 8: 6-bit fixed-length (9.2.1): (0,0) is 000011, else
    # code = 4*(TotalCoeff-1) + TrailingOnes
    code = br.u(6)
    if code == 3:
        return (0, 0)
    return (code & 3, (code >> 2) + 1)


def _write_coeff_token(bw: _BitWriter, nC: int, t1: int, tc: int) -> None:
    if nC == -1:
        bw.put_str(_COEFF_TOKEN_CHROMA_DC[(t1, tc)])
    elif nC < 2:
        bw.put_str(_COEFF_TOKEN_CTX0[(t1, tc)])
    elif nC < 4:
        bw.put_str(_COEFF_TOKEN_CTX1[(t1, tc)])
    elif nC < 8:
        bw.put_str(_COEFF_TOKEN_CTX2[(t1, tc)])
    else:
        bw.u(6, 3 if tc == 0 else 4 * (tc - 1) + t1)


def _decode_residual_block(
    br: _BitReader, nC: int, max_coeffs: int
) -> list[int]:
    """residual_block_cavlc (9.2): returns max_coeffs coefficient
    levels in (zigzag) scan order."""
    t1, tc = _read_coeff_token(br, nC)
    coeffs = [0] * max_coeffs
    if tc == 0:
        return coeffs
    if tc > max_coeffs:
        raise ValueError(f"coeff_token TotalCoeff {tc} > {max_coeffs}")
    levels = []
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(tc):
        if i < t1:
            levels.append(1 - 2 * br.u(1))
            continue
        prefix = 0
        while not br.u(1):
            prefix += 1
            if prefix > 31:
                raise ValueError("level_prefix too long")
        size = suffix_len
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        suffix = br.u(size) if size else 0
        code = (min(15, prefix) << suffix_len) + suffix
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == t1 and t1 < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if tc < max_coeffs:
        if max_coeffs == 4:  # chroma DC
            tz_tab = _TOTAL_ZEROS_CDC[tc]
        else:
            tz_tab = _TOTAL_ZEROS_4x4[tc]
        dec = {code: i for i, code in enumerate(tz_tab)}
        total_zeros = _read_vlc(br, dec, "total_zeros")
    else:
        total_zeros = 0
    # run_before
    zeros_left = total_zeros
    runs = []
    for i in range(tc - 1):
        if zeros_left > 0:
            if zeros_left <= 6:
                dec = {c: r for r, c in enumerate(_RUN_BEFORE[zeros_left])}
                run = _read_vlc(br, dec, "run_before")
            else:
                # 3-bit codes 111..001 for 0..6; run >= 7 is
                # (run-4) zeros then a 1
                v = br.u(3)
                if v:
                    run = 7 - v
                else:
                    run = 7
                    while not br.u(1):
                        run += 1
                        if run > max_coeffs:
                            raise ValueError("run_before too long")
            zeros_left -= run
            if zeros_left < 0:
                raise ValueError("run_before exceeds zeros_left")
        else:
            run = 0
        runs.append(run)
    pos = tc + total_zeros - 1
    for i in range(tc):
        if pos < 0 or pos >= max_coeffs:
            raise ValueError("CAVLC coefficient position out of range")
        coeffs[pos] = levels[i]
        pos -= 1
        if i < tc - 1:
            pos -= runs[i]
    return coeffs


def _encode_residual_block(
    bw: _BitWriter, coeffs: list[int], nC: int, max_coeffs: int
) -> int:
    """Inverse of _decode_residual_block; returns TotalCoeff (the
    caller stores it for neighbor nC bookkeeping)."""
    nz = [i for i, c in enumerate(coeffs) if c]
    tc = len(nz)
    # trailing ones: up to 3 final +/-1 coefficients (highest freq)
    t1 = 0
    for i in reversed(nz):
        if abs(coeffs[i]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    _write_coeff_token(bw, nC, t1, tc)
    if tc == 0:
        return 0
    total_zeros = nz[-1] + 1 - tc
    # levels, highest frequency first
    order = list(reversed(nz))
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i, idx in enumerate(order):
        level = coeffs[idx]
        if i < t1:
            bw.u(1, 0 if level > 0 else 1)
            continue
        code = 2 * abs(level) - 2 if level > 0 else 2 * abs(level) - 1
        if i == t1 and t1 < 3:
            code -= 2
        if suffix_len == 0 and code < 14:
            bw.put_str("0" * code + "1")
        elif suffix_len == 0 and code < 30:
            bw.put_str("0" * 14 + "1")
            bw.u(4, code - 14)
        elif suffix_len > 0 and code < (15 << suffix_len):
            bw.put_str("0" * (code >> suffix_len) + "1")
            bw.u(suffix_len, code & ((1 << suffix_len) - 1))
        else:
            # escape ladder: prefix p >= 15 carries a (p-3)-bit suffix;
            # successive prefixes cover contiguous levelCode ranges
            # (the exact inverse of the 9.2.2.1 decode arithmetic)
            p = 15
            low = 30 if suffix_len == 0 else (15 << suffix_len)
            while code >= low + (1 << (p - 3)):
                low += 1 << (p - 3)
                p += 1
            bw.put_str("0" * p + "1")
            bw.u(p - 3, code - low)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if tc < max_coeffs:
        tab = _TOTAL_ZEROS_CDC[tc] if max_coeffs == 4 else _TOTAL_ZEROS_4x4[tc]
        bw.put_str(tab[total_zeros])
    zeros_left = total_zeros
    for i in range(tc - 1):
        if zeros_left <= 0:
            break
        run = order[i] - order[i + 1] - 1
        if zeros_left <= 6:
            bw.put_str(_RUN_BEFORE[zeros_left][run])
        elif run < 7:
            bw.u(3, 7 - run)
        else:
            bw.put_str("0" * (run - 4) + "1")
        zeros_left -= run
    return tc


# ---------------------------------------------------------------------------
# transforms & quantization (8.5)
# ---------------------------------------------------------------------------

# LevelScale4x4 normAdjust (Table in 8.5.9, flat scaling lists):
# columns are the three position classes.
_LS_V = [
    (10, 16, 13),
    (11, 18, 14),
    (13, 20, 16),
    (14, 23, 18),
    (16, 25, 20),
    (18, 29, 23),
]

_ZIGZAG_4x4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

_QPC_FROM_QPI = [
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36,
    37, 37, 37, 38, 38, 38, 39, 39, 39, 39,
]


def _chroma_qp(qp_y: int, offset: int) -> int:
    qpi = min(51, max(0, qp_y + offset))
    return qpi if qpi < 30 else _QPC_FROM_QPI[qpi - 30]


def _ls_class(i: int, j: int) -> int:
    if i % 2 == 0 and j % 2 == 0:
        return 0
    if i % 2 == 1 and j % 2 == 1:
        return 1
    return 2


def _hadamard4(m: np.ndarray) -> np.ndarray:
    """The +/-1 4x4 Hadamard used both forward and inverse for the
    Intra_16x16 luma DC block (8.5.10)."""
    h = np.array(
        [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
        dtype=np.int64,
    )
    return h @ m @ h.T


def _inverse_core_4x4(d: np.ndarray) -> np.ndarray:
    """8.5.12.2: the 4x4 integer inverse transform; input the dequant-
    scaled coefficients, output the residual BEFORE the (x+32)>>6."""
    d = d.astype(np.int64)
    # horizontal (rows)
    e = np.empty_like(d)
    e[:, 0] = d[:, 0] + d[:, 2]
    e[:, 1] = d[:, 0] - d[:, 2]
    e[:, 2] = (d[:, 1] >> 1) - d[:, 3]
    e[:, 3] = d[:, 1] + (d[:, 3] >> 1)
    f = np.empty_like(d)
    f[:, 0] = e[:, 0] + e[:, 3]
    f[:, 1] = e[:, 1] + e[:, 2]
    f[:, 2] = e[:, 1] - e[:, 2]
    f[:, 3] = e[:, 0] - e[:, 3]
    # vertical (columns)
    e[0, :] = f[0, :] + f[2, :]
    e[1, :] = f[0, :] - f[2, :]
    e[2, :] = (f[1, :] >> 1) - f[3, :]
    e[3, :] = f[1, :] + (f[3, :] >> 1)
    g = np.empty_like(d)
    g[0, :] = e[0, :] + e[3, :]
    g[1, :] = e[1, :] + e[2, :]
    g[2, :] = e[1, :] - e[2, :]
    g[3, :] = e[0, :] - e[3, :]
    return g


def _dequant_luma_dc(f: np.ndarray, qp: int) -> np.ndarray:
    """8.5.10 (8-bit): scale the inverse-Hadamard'd luma DC.

    LevelScale4x4(m, 0, 0) = weightScale(0,0) * normAdjust(m, 0) with
    flat scaling lists, i.e. 16 * _LS_V[m][0] — the x16 pairs with the
    FRExt shift amounts used here.  Bit-identical to the pre-FRExt
    2003-edition ladder (qp>=12: f*V << (qp/6-2); else rounding-add
    >> (2-qp/6)) for every qp; tests pin both editions against each
    other so the absolute scale (DC contribution = 4x an equal AC
    level) can't silently drift again."""
    ls = 16 * _LS_V[qp % 6][0]
    qp6 = qp // 6
    f = f.astype(np.int64)
    if qp >= 36:
        return (f * ls) << (qp6 - 6)
    return (f * ls + (1 << (5 - qp6))) >> (6 - qp6)


def _dequant_chroma_dc(f: np.ndarray, qpc: int) -> np.ndarray:
    """8.5.11 (4:2:0, 8-bit): LevelScale includes the x16 weightScale,
    paired with the FRExt >>5 (equals the 2003 V-only form >>1)."""
    ls = 16 * _LS_V[qpc % 6][0]
    return ((f.astype(np.int64) * ls) << (qpc // 6)) >> 5


def _dequant_ac(coeffs: np.ndarray, qp: int) -> np.ndarray:
    """8.5.12.1 for 4x4 blocks (flat scaling lists): positions other
    than the externally-substituted DC."""
    qp6 = qp // 6
    out = coeffs.astype(np.int64).copy()
    for i in range(4):
        for j in range(4):
            out[i, j] = (out[i, j] * _LS_V[qp % 6][_ls_class(i, j)]) << qp6
    return out


def _scan_to_block(scan: list[int], start: int = 0) -> np.ndarray:
    """Zigzag scan order -> 4x4 raster block. ``start`` 1 for AC-only
    blocks (15 coefficients at scan positions 1..15)."""
    blk = np.zeros(16, dtype=np.int64)
    for k, level in enumerate(scan):
        blk[_ZIGZAG_4x4[k + start]] = level
    return blk.reshape(4, 4)


def _block_to_scan(blk: np.ndarray, start: int = 0) -> list[int]:
    flat = blk.reshape(16)
    return [int(flat[_ZIGZAG_4x4[k]]) for k in range(start, 16)]


# ---------------------------------------------------------------------------
# inter prediction (8.4) — round 16: P slices with ONE reference
# frame (the previously decoded picture).  Fully algorithmic: the
# 6-tap (1,-5,20,20,-5,1) luma half-pel filter, quarter-pel
# averaging, chroma 1/8-pel bilinear, and the 8.4.1.3 median motion
# vector prediction — no new VLC tables beyond the Table 9-4 inter
# CBP column.
# ---------------------------------------------------------------------------


def _interp_luma_block(
    ref: np.ndarray, x0: int, y0: int, bw: int, bh: int,
    mvx: int, mvy: int,
) -> np.ndarray:
    """8.4.2.2.1: the quarter-pel luma prediction block at (x0, y0)
    size (bw, bh) with quarter-pel motion vector (mvx, mvy), reference
    extended by edge replication (coordinate clamping)."""
    xi, yi = x0 + (mvx >> 2), y0 + (mvy >> 2)
    xf, yf = mvx & 3, mvy & 3
    h, w = ref.shape
    rows = np.clip(np.arange(yi - 2, yi + bh + 3), 0, h - 1)
    cols = np.clip(np.arange(xi - 2, xi + bw + 3), 0, w - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)  # (bh+5, bw+5)
    G = win[2 : 2 + bh, 2 : 2 + bw]
    if xf == 0 and yf == 0:
        return G
    clip = lambda a: np.clip(a, 0, 255)
    # b1: horizontal 6-tap, un-rounded; aligned so b1[:, c] sits half a
    # sample right of win[:, 2 + c]
    b1 = (
        win[:, 0:-5] - 5 * win[:, 1:-4] + 20 * win[:, 2:-3]
        + 20 * win[:, 3:-2] - 5 * win[:, 4:-1] + win[:, 5:]
    )
    # h1: vertical 6-tap, un-rounded; h1[r, :] half a sample below
    # win[2 + r, :]
    h1 = (
        win[0:-5, :] - 5 * win[1:-4, :] + 20 * win[2:-3, :]
        + 20 * win[3:-2, :] - 5 * win[4:-1, :] + win[5:, :]
    )
    b = clip((b1[2 : 2 + bh, :] + 16) >> 5)          # (bh, bw) at (2,0)
    hh = clip((h1[:, 2 : 2 + bw] + 16) >> 5)         # (bh, bw) at (0,2)
    # j: 6-tap across the un-rounded h1 columns (equivalently b1 rows)
    j1 = (
        h1[:, 0:-5] - 5 * h1[:, 1:-4] + 20 * h1[:, 2:-3]
        + 20 * h1[:, 3:-2] - 5 * h1[:, 4:-1] + h1[:, 5:]
    )
    j = clip((j1 + 512) >> 10)                       # (bh, bw) at (2,2)
    H_ = win[2 : 2 + bh, 3 : 3 + bw]                 # integer right
    M = win[3 : 3 + bh, 2 : 2 + bw]                  # integer below
    m = clip((h1[:, 3 : 3 + bw] + 16) >> 5)          # half-vert, col+1
    s = clip((b1[3 : 3 + bh, :] + 16) >> 5)          # half-horz, row+1
    avg = lambda a, c: (a + c + 1) >> 1
    table = {
        (1, 0): avg(G, b), (2, 0): b, (3, 0): avg(H_, b),
        (0, 1): avg(G, hh), (1, 1): avg(b, hh), (2, 1): avg(b, j),
        (3, 1): avg(b, m),
        (0, 2): hh, (1, 2): avg(hh, j), (2, 2): j, (3, 2): avg(j, m),
        (0, 3): avg(M, hh), (1, 3): avg(hh, s), (2, 3): avg(j, s),
        (3, 3): avg(m, s),
    }
    return table[(xf, yf)]


def _interp_chroma_block(
    ref: np.ndarray, x0: int, y0: int, bw: int, bh: int,
    mvx: int, mvy: int,
) -> np.ndarray:
    """8.4.2.2.2: 1/8-pel bilinear chroma prediction (4:2:0 — the
    luma quarter-pel vector IS the chroma eighth-pel vector)."""
    xi, yi = x0 + (mvx >> 3), y0 + (mvy >> 3)
    xf, yf = mvx & 7, mvy & 7
    h, w = ref.shape
    rows = np.clip(np.arange(yi, yi + bh + 1), 0, h - 1)
    cols = np.clip(np.arange(xi, xi + bw + 1), 0, w - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)
    A = win[:bh, :bw]
    B = win[:bh, 1 : bw + 1]
    C = win[1 : bh + 1, :bw]
    D = win[1 : bh + 1, 1 : bw + 1]
    return (
        (8 - xf) * (8 - yf) * A + xf * (8 - yf) * B
        + (8 - xf) * yf * C + xf * yf * D + 32
    ) >> 6


# ref4 grid conventions: -2 = unavailable (outside the picture or not
# yet decoded), -1 = intra (AVAILABLE but with no motion — 8.4.1.3.2
# assigns it mv (0,0), refIdx -1, and it does NOT trigger the C -> D
# substitution), >= 0 = inter reference index.
_REF_UNAVAIL = -2
_REF_INTRA = -1


def _is_unavail(
    ref4: np.ndarray, gx: int, gy: int, min_mb: int = 0
) -> bool:
    h4, w4 = ref4.shape
    if gx < 0 or gy < 0 or gx >= w4 or gy >= h4:
        return True
    if int(ref4[gy, gx]) == _REF_UNAVAIL:
        return True
    # 6.4.8: macroblocks before the current slice's first_mb belong
    # to another slice and are unavailable for prediction
    return (gy // 4) * (w4 // 4) + (gx // 4) < min_mb


def _neighbor_mv(
    mv4: np.ndarray, ref4: np.ndarray, gx: int, gy: int, min_mb: int = 0
) -> tuple[int, int, int]:
    """(mvx, mvy, ref) of the 4x4 block at grid (gx, gy); unavailable
    AND intra neighbors both yield (0, 0, -1) here (8.4.1.3.2) — the
    C -> D substitution distinguishes them via _is_unavail."""
    if (
        _is_unavail(ref4, gx, gy, min_mb)
        or int(ref4[gy, gx]) == _REF_INTRA
    ):
        return 0, 0, -1
    return int(mv4[0, gy, gx]), int(mv4[1, gy, gx]), int(ref4[gy, gx])


def _mvp_median(
    mv4: np.ndarray, ref4: np.ndarray,
    gx: int, gy: int, pw4: int, ph4: int,
    ref_idx: int = 0, part_hint: str | None = None, min_mb: int = 0,
) -> tuple[int, int]:
    """8.4.1.3: median motion-vector prediction for the partition
    whose top-left 4x4 grid cell is (gx, gy), width ``pw4`` in 4x4
    units. ``part_hint`` 'top'/'bottom' (16x8) or 'left'/'right'
    (8x16) applies the directional shortcuts of 8.4.1.3; ``min_mb``
    is the current slice's first macroblock (other-slice neighbors
    are unavailable)."""
    ax, ay, ar = _neighbor_mv(mv4, ref4, gx - 1, gy, min_mb)
    bx, by, br_ = _neighbor_mv(mv4, ref4, gx, gy - 1, min_mb)
    c_unavail = _is_unavail(ref4, gx + pw4, gy - 1, min_mb)
    if c_unavail:  # C -> D (above-left) on TRUE unavailability only
        cx, cy, cr = _neighbor_mv(mv4, ref4, gx - 1, gy - 1, min_mb)
    else:
        cx, cy, cr = _neighbor_mv(mv4, ref4, gx + pw4, gy - 1, min_mb)
    if part_hint == "top" and br_ == ref_idx:
        return bx, by
    if part_hint in ("bottom", "left") and ar == ref_idx:
        return ax, ay
    if part_hint == "right" and cr == ref_idx:
        return cx, cy
    # B, C and D all unavailable (top slice row): mvp = mvA
    if (
        _is_unavail(ref4, gx, gy - 1, min_mb)
        and _is_unavail(ref4, gx + pw4, gy - 1, min_mb)
        and _is_unavail(ref4, gx - 1, gy - 1, min_mb)
    ):
        return ax, ay
    matches = [m for m in ((ax, ay, ar), (bx, by, br_), (cx, cy, cr))
               if m[2] == ref_idx]
    if len(matches) == 1:
        return matches[0][0], matches[0][1]
    mx = int(np.median([ax, bx, cx]))
    my = int(np.median([ay, by, cy]))
    return mx, my


def _mv_skip(
    mv4: np.ndarray, ref4: np.ndarray, gx: int, gy: int, min_mb: int = 0
) -> tuple[int, int]:
    """8.4.1.1: the P_Skip motion vector — (0,0) when either the left
    or top neighbor is unavailable or is a zero-motion refIdx-0
    block; otherwise the 16x16 median prediction."""
    ax, ay, ar = _neighbor_mv(mv4, ref4, gx - 1, gy, min_mb)
    bx, by, br_ = _neighbor_mv(mv4, ref4, gx, gy - 1, min_mb)
    if (
        _is_unavail(ref4, gx - 1, gy, min_mb)
        or _is_unavail(ref4, gx, gy - 1, min_mb)
    ):
        return 0, 0
    if ar == 0 and ax == 0 and ay == 0:
        return 0, 0
    if br_ == 0 and bx == 0 and by == 0:
        return 0, 0
    return _mvp_median(mv4, ref4, gx, gy, 4, 4, min_mb=min_mb)


def _apply_weight(pred: np.ndarray, wp, denom: int) -> np.ndarray:
    """8.4.2.3.2 explicit weighted sample prediction, unidirectional:
    Clip1(((pred * w + 2^(denom-1)) >> denom) + offset); identity
    when ``wp`` is None."""
    if wp is None:
        return pred
    w, o = wp
    if denom > 0:
        out = ((pred * w + (1 << (denom - 1))) >> denom) + o
    else:
        out = pred * w + o
    return np.clip(out, 0, 255)


# Table 9-4, coded_block_pattern me(v) mapping — INTER column
# (codeNum -> cbp); verified a permutation of 0..47 by tests alongside
# fixture round-trips across the cbp range.
_CBP_INTER_FROM_CODE = [
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13, 14, 6, 9,
    31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46, 17, 18, 20,
    24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41,
]
_CBP_INTER_TO_CODE = {v: i for i, v in enumerate(_CBP_INTER_FROM_CODE)}


# ---------------------------------------------------------------------------
# in-loop deblocking filter (8.7) — Tables 8-16 (alpha, beta) and
# 8-17 (tc0) indexed 0..51.  For all-intra pictures boundary strength
# is 4 on macroblock edges and 3 on internal 4x4 edges; P slices
# (round 16) add the inter strengths: 2 when either side has coded
# coefficients, 1 on a >= 1-sample (4 quarter-pel units) motion
# difference or reference change, 0 otherwise (edge skipped).
# ---------------------------------------------------------------------------

_DEBLOCK_ALPHA = [0] * 16 + [
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
    40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203,
    226, 255, 255,
]
_DEBLOCK_BETA = [0] * 16 + [
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11,
    11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18,
]
# tc0 rows for bS 1, 2, 3
_DEBLOCK_TC0 = [
    [0] * 16 + [0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 3,
                3, 3, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18,
                20, 23],
    [0] * 16 + [0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4,
                4, 5, 5, 6, 7, 8, 8, 9, 11, 12, 13, 15, 17, 19, 21,
                23, 25, 27],
    [0] * 16 + [1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 5,
                6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23, 25, 27,
                30, 33, 36],
]


def _deblock_edge(
    p: np.ndarray, q: np.ndarray, bs, index_a: int, index_b: int,
    is_luma: bool,
) -> None:
    """Filter ONE edge in place (8.7.2.3/8.7.2.4).  ``p``/``q`` are
    (4, N) int64 stacks — row i holds sample p_i / q_i for each of
    the N lines crossing the edge.  ``bs`` is a scalar or a per-line
    array (P-slice edges mix strengths per 4x4 segment)."""
    alpha = _DEBLOCK_ALPHA[index_a]
    beta = _DEBLOCK_BETA[index_b]
    p0, p1, p2, p3 = p[0], p[1], p[2], p[3]
    q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
    bs = np.broadcast_to(np.asarray(bs, dtype=np.int64), p0.shape)
    filt = (
        (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
        & (bs > 0)
    )
    if not filt.any():
        return
    is4 = bs == 4
    lt4 = filt & ~is4
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    # --- bS < 4: tc-clipped delta (tc0 looked up per line) ---
    tc0_by_bs = np.array(
        [0]
        + [_DEBLOCK_TC0[b - 1][index_a] for b in (1, 2, 3)]
        + [0],
        dtype=np.int64,
    )
    tc0 = tc0_by_bs[np.clip(bs, 0, 4)]
    if is_luma:
        tc = tc0 + ap.astype(np.int64) + aq.astype(np.int64)
    else:
        tc = tc0 + 1
    delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0n = np.where(lt4, np.clip(p0 + delta, 0, 255), p0)
    q0n = np.where(lt4, np.clip(q0 - delta, 0, 255), q0)
    p1n, p2n, q1n, q2n = p1, p2, q1, q2
    if is_luma:
        # p1/q1 nudged toward the p2/q2-side average, Clip3 by tc0
        # (8-360/8-361; no Clip1 needed — movement is toward an
        # in-range target and Clip3 only shortens it)
        dp1 = np.clip(
            (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1, -tc0, tc0
        )
        dq1 = np.clip(
            (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1, -tc0, tc0
        )
        p1n = np.where(lt4 & ap, p1 + dp1, p1)
        q1n = np.where(lt4 & aq, q1 + dq1, q1)
    # --- bS == 4 ---
    if is4.any():
        f4 = filt & is4
        if is_luma:
            strong = np.abs(p0 - q0) < ((alpha >> 2) + 2)
            sp = f4 & strong & ap
            sq = f4 & strong & aq
            p0n = np.where(
                sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                np.where(f4, (2 * p1 + p0 + q1 + 2) >> 2, p0n),
            )
            p1n = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1n)
            p2n = np.where(
                sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2n
            )
            q0n = np.where(
                sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                np.where(f4, (2 * q1 + q0 + p1 + 2) >> 2, q0n),
            )
            q1n = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1n)
            q2n = np.where(
                sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2n
            )
        else:  # chroma bS=4: p0/q0 only, no strong/weak split
            p0n = np.where(f4, (2 * p1 + p0 + q1 + 2) >> 2, p0n)
            q0n = np.where(f4, (2 * q1 + q0 + p1 + 2) >> 2, q0n)
    p[0], p[1], p[2] = p0n, p1n, p2n
    q[0], q[1], q[2] = q0n, q1n, q2n


def _edge_views(
    plane: np.ndarray, x: int, y: int, n: int, vertical: bool
) -> tuple[np.ndarray, np.ndarray]:
    """(p, q) stacks of the 4 samples each side of the edge at
    (x, y) spanning ``n`` lines. Copies in, caller writes back."""
    if vertical:
        p = np.stack([plane[y : y + n, x - 1 - i] for i in range(4)])
        q = np.stack([plane[y : y + n, x + i] for i in range(4)])
    else:
        p = np.stack([plane[y - 1 - i, x : x + n] for i in range(4)])
        q = np.stack([plane[y + i, x : x + n] for i in range(4)])
    return p, q


def _edge_writeback(
    plane: np.ndarray, x: int, y: int, n: int, vertical: bool,
    p: np.ndarray, q: np.ndarray,
) -> None:
    if vertical:
        for i in range(3):
            plane[y : y + n, x - 1 - i] = p[i]
            plane[y : y + n, x + i] = q[i]
    else:
        for i in range(3):
            plane[y - 1 - i, x : x + n] = p[i]
            plane[y + i, x : x + n] = q[i]


def _deblock_bs_grids(
    ref4: np.ndarray,
    luma_tc: np.ndarray,
    mv4: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-4x4 boundary-strength grids (8.7.2.1, frame coding):
    ``bs_v[gy, gx]`` is the strength of the vertical edge on the LEFT
    of block (gy, gx); ``bs_h`` the edge ABOVE it.  4: either side
    intra on a MB edge; 3: either side intra, internal; 2: either
    side with coded coefficients; 1: reference change or a motion
    difference >= 4 quarter-pel units in either component; 0: none."""
    h4, w4 = ref4.shape
    intra = ref4 == _REF_INTRA

    def grid(p_sl, q_sl, mb_edge_mask):
        ip, iq = intra[p_sl], intra[q_sl]
        either_intra = ip | iq
        coded = (luma_tc[p_sl] > 0) | (luma_tc[q_sl] > 0)
        refdiff = ref4[p_sl] != ref4[q_sl]
        mvdiff = (
            (np.abs(mv4[0][p_sl] - mv4[0][q_sl]) >= 4)
            | (np.abs(mv4[1][p_sl] - mv4[1][q_sl]) >= 4)
        )
        return np.where(
            either_intra,
            np.where(mb_edge_mask, 4, 3),
            np.where(coded, 2, np.where(refdiff | mvdiff, 1, 0)),
        )

    bs_v = np.zeros((h4, w4), dtype=np.int64)
    cols = np.arange(1, w4)
    bs_v[:, 1:] = grid(
        (slice(None), slice(0, w4 - 1)),
        (slice(None), slice(1, w4)),
        (cols % 4 == 0)[None, :],
    )
    bs_h = np.zeros((h4, w4), dtype=np.int64)
    rows = np.arange(1, h4)
    bs_h[1:, :] = grid(
        (slice(0, h4 - 1), slice(None)),
        (slice(1, h4), slice(None)),
        (rows % 4 == 0)[:, None],
    )
    return bs_v, bs_h


def _deblock_frame(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, qp_map: np.ndarray,
    chroma_qp_off: int, off_a: int, off_b: int,
    bs_v: np.ndarray | None = None, bs_h: np.ndarray | None = None,
    slice_map: np.ndarray | None = None,
    slice_params: list | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """8.7: macroblocks in raster order, each filtering its vertical
    edges left-to-right then horizontal edges top-to-bottom, on
    samples already modified by earlier edges.  ``qp_map`` is the
    per-MB luma QP (I_PCM counts as 0).  ``bs_v``/``bs_h`` are the
    per-4x4 strength grids (_deblock_bs_grids); None means the
    all-intra constants (4 on MB edges, 3 internal).  Chroma edges
    take the co-located luma block's strength per 2-line pair.
    Multi-slice pictures pass ``slice_map`` + ``slice_params``: each
    macroblock filters with ITS slice's (idc, offA, offB); idc 1
    skips the macroblock's edges, idc 2 skips edges whose other side
    lies in a different slice."""
    h_mbs, w_mbs = qp_map.shape
    yp = y.astype(np.int64)
    cbp = cb.astype(np.int64)
    crp = cr.astype(np.int64)

    def do_edge(
        plane, x0, y0, e, vertical, bs, qp_p, qp_q, is_luma, n,
        off_a=off_a, off_b=off_b,
    ):
        qpav = (qp_p + qp_q + 1) >> 1
        index_a = min(51, max(0, qpav + off_a))
        index_b = min(51, max(0, qpav + off_b))
        if vertical:
            ex, ey = x0 + e, y0
        else:
            ex, ey = x0, y0 + e
        p, q = _edge_views(plane, ex, ey, n, vertical)
        _deblock_edge(p, q, bs, index_a, index_b, is_luma)
        _edge_writeback(plane, ex, ey, n, vertical, p, q)

    def luma_bs(mbx, mby, e, vertical):
        if bs_v is None:
            return 4 if e == 0 else 3
        gx, gy = mbx * 4, mby * 4
        if vertical:
            return np.repeat(bs_v[gy : gy + 4, gx + e // 4], 4)
        return np.repeat(bs_h[gy + e // 4, gx : gx + 4], 4)

    def chroma_bs(mbx, mby, e, vertical):
        # chroma line yc maps to luma line 2*yc -> luma block yc // 2
        if bs_v is None:
            return 4 if e == 0 else 3
        gx, gy = mbx * 4, mby * 4
        if vertical:
            return np.repeat(bs_v[gy : gy + 4, gx + e // 2], 2)
        return np.repeat(bs_h[gy + e // 2, gx : gx + 4], 2)

    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            if slice_params is not None:
                idc, oa, ob = slice_params[int(slice_map[mby, mbx])]
                if idc == 1:  # this MB's slice disabled the filter
                    continue
            else:
                idc, oa, ob = 0, off_a, off_b

            def cross_ok(nx, ny):
                # idc 2: no filtering across slice boundaries
                if slice_map is None or idc != 2:
                    return True
                return slice_map[ny, nx] == slice_map[mby, mbx]

            qp = int(qp_map[mby, mbx])
            qpc = _chroma_qp(qp, chroma_qp_off)
            # --- vertical edges (left MB edge + internal) ---
            for e in (0, 4, 8, 12):
                if e == 0 and (mbx == 0 or not cross_ok(mbx - 1, mby)):
                    continue
                qp_p = int(qp_map[mby, mbx - 1]) if e == 0 else qp
                do_edge(
                    yp, mbx * 16, mby * 16, e, True,
                    luma_bs(mbx, mby, e, True), qp_p, qp, True, 16,
                    off_a=oa, off_b=ob,
                )
            for e in (0, 4):
                if e == 0 and (mbx == 0 or not cross_ok(mbx - 1, mby)):
                    continue
                qp_p = (
                    _chroma_qp(int(qp_map[mby, mbx - 1]), chroma_qp_off)
                    if e == 0 else qpc
                )
                for plane in (cbp, crp):
                    do_edge(
                        plane, mbx * 8, mby * 8, e, True,
                        chroma_bs(mbx, mby, e, True), qp_p, qpc,
                        False, 8, off_a=oa, off_b=ob,
                    )
            # --- horizontal edges (top MB edge + internal) ---
            for e in (0, 4, 8, 12):
                if e == 0 and (mby == 0 or not cross_ok(mbx, mby - 1)):
                    continue
                qp_p = int(qp_map[mby - 1, mbx]) if e == 0 else qp
                do_edge(
                    yp, mbx * 16, mby * 16, e, False,
                    luma_bs(mbx, mby, e, False), qp_p, qp, True, 16,
                    off_a=oa, off_b=ob,
                )
            for e in (0, 4):
                if e == 0 and (mby == 0 or not cross_ok(mbx, mby - 1)):
                    continue
                qp_p = (
                    _chroma_qp(int(qp_map[mby - 1, mbx]), chroma_qp_off)
                    if e == 0 else qpc
                )
                for plane in (cbp, crp):
                    do_edge(
                        plane, mbx * 8, mby * 8, e, False,
                        chroma_bs(mbx, mby, e, False), qp_p, qpc,
                        False, 8, off_a=oa, off_b=ob,
                    )
    return (
        yp.astype(np.uint8), cbp.astype(np.uint8), crp.astype(np.uint8)
    )


# ---------------------------------------------------------------------------
# parameter sets & slice header (7.3)
# ---------------------------------------------------------------------------

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134}


def parse_sps(rbsp: bytes) -> dict:
    br = _BitReader(rbsp)
    profile = br.u(8)
    br.u(8)  # constraint flags + reserved
    level = br.u(8)
    sps_id = br.ue()
    chroma_format = 1
    if profile in _HIGH_PROFILES:
        chroma_format = br.ue()
        if chroma_format == 3:
            br.u(1)
        bd_l, bd_c = br.ue(), br.ue()
        if bd_l or bd_c:
            raise NotImplementedError("high bit depth")
        br.u(1)  # qpprime_y_zero_transform_bypass
        if br.u(1):  # seq_scaling_matrix_present
            raise NotImplementedError("SPS scaling matrices")
    if chroma_format != 1:
        raise NotImplementedError(f"chroma_format_idc {chroma_format}")
    log2_max_frame_num = br.ue() + 4
    poc_type = br.ue()
    log2_max_poc_lsb = 0
    if poc_type == 0:
        log2_max_poc_lsb = br.ue() + 4
    elif poc_type == 1:
        raise NotImplementedError("pic_order_cnt_type 1")
    max_num_ref_frames = br.ue()
    br.u(1)  # gaps_in_frame_num_value_allowed
    w_mbs = br.ue() + 1
    h_map = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("interlace (frame_mbs_only_flag=0)")
    br.u(1)  # direct_8x8_inference
    crop = (0, 0, 0, 0)
    if br.u(1):
        crop = (br.ue(), br.ue(), br.ue(), br.ue())  # l, r, t, b
    return {
        "profile": profile,
        "level": level,
        "sps_id": sps_id,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "width_mbs": w_mbs,
        "height_mbs": h_map,
        "crop": crop,  # in chroma units: luma pixels = 2x (4:2:0)
        "max_num_ref_frames": max_num_ref_frames,
    }


def parse_pps(rbsp: bytes) -> dict:
    br = _BitReader(rbsp)
    pps_id = br.ue()
    sps_id = br.ue()
    if br.u(1):
        raise NotImplementedError("CABAC (entropy_coding_mode_flag=1)")
    bottom_poc = br.u(1)
    if br.ue() != 0:
        raise NotImplementedError("FMO (num_slice_groups > 1)")
    num_ref_l0_default = br.ue() + 1
    br.ue()  # num_ref_idx_l1_default_active_minus1
    weighted_pred = br.u(1)
    br.u(2)  # weighted_bipred_idc
    init_qp = br.se() + 26
    br.se()  # pic_init_qs
    chroma_qp_off = br.se()
    deblock_ctrl = br.u(1)
    br.u(1)  # constrained_intra_pred
    redundant = br.u(1)
    if br.more_rbsp_data():  # PPS extension (High profile)
        if br.u(1):  # transform_8x8_mode_flag
            raise NotImplementedError(
                "8x8 transform (PPS transform_8x8_mode_flag=1)"
            )
        if br.u(1):  # pic_scaling_matrix_present_flag
            raise NotImplementedError("PPS scaling matrices")
        if br.se() != chroma_qp_off:  # second_chroma_qp_index_offset
            raise NotImplementedError(
                "independent Cr QP offset (second_chroma_qp_index_offset)"
            )
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "bottom_poc": bottom_poc,
        "init_qp": init_qp,
        "chroma_qp_off": chroma_qp_off,
        "deblock_ctrl": deblock_ctrl,
        "redundant": redundant,
        "weighted_pred": weighted_pred,
        "num_ref_l0_default": num_ref_l0_default,
    }


# ---------------------------------------------------------------------------
# intra prediction (8.3)
# ---------------------------------------------------------------------------


def _pred_16x16(
    mode: int, plane: np.ndarray, x0: int, y0: int, left: bool, top: bool
) -> np.ndarray:
    if mode == 0:  # Vertical
        if not top:
            raise ValueError("Intra_16x16 Vertical without top neighbor")
        return np.tile(plane[y0 - 1, x0 : x0 + 16].astype(np.int64), (16, 1))
    if mode == 1:  # Horizontal
        if not left:
            raise ValueError("Intra_16x16 Horizontal without left neighbor")
        return np.tile(
            plane[y0 : y0 + 16, x0 - 1].astype(np.int64).reshape(16, 1),
            (1, 16),
        )
    if mode == 2:  # DC
        if left and top:
            s = int(plane[y0 - 1, x0 : x0 + 16].sum()) + int(
                plane[y0 : y0 + 16, x0 - 1].sum()
            )
            dc = (s + 16) >> 5
        elif left:
            dc = (int(plane[y0 : y0 + 16, x0 - 1].sum()) + 8) >> 4
        elif top:
            dc = (int(plane[y0 - 1, x0 : x0 + 16].sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, dtype=np.int64)
    if mode == 3:  # Plane (8.3.3.4)
        if not (left and top):
            raise ValueError("Intra_16x16 Plane without both neighbors")
        p = plane.astype(np.int64)
        hsum = sum(
            (x + 1) * (p[y0 - 1, x0 + 8 + x] - p[y0 - 1, x0 + 6 - x])
            for x in range(8)
        )
        vsum = sum(
            (y + 1) * (p[y0 + 8 + y, x0 - 1] - p[y0 + 6 - y, x0 - 1])
            for y in range(8)
        )
        a = 16 * (p[y0 + 15, x0 - 1] + p[y0 - 1, x0 + 15])
        b = (5 * hsum + 32) >> 6
        c = (5 * vsum + 32) >> 6
        ys, xs = np.mgrid[0:16, 0:16]
        return np.clip((a + b * (xs - 7) + c * (ys - 7) + 16) >> 5, 0, 255)
    raise ValueError(f"bad Intra_16x16 prediction mode {mode}")


def _pred_chroma(
    mode: int, plane: np.ndarray, x0: int, y0: int, left: bool, top: bool
) -> np.ndarray:
    """Intra chroma prediction, 4:2:0 8x8 (8.3.4). Mode 0 DC has the
    per-4x4-quadrant neighbor rules; 1=Horizontal, 2=Vertical,
    3=Plane."""
    p = plane.astype(np.int64)
    if mode == 1:
        if not left:
            raise ValueError("chroma Horizontal without left neighbor")
        return np.tile(p[y0 : y0 + 8, x0 - 1].reshape(8, 1), (1, 8))
    if mode == 2:
        if not top:
            raise ValueError("chroma Vertical without top neighbor")
        return np.tile(p[y0 - 1, x0 : x0 + 8], (8, 1))
    if mode == 3:
        if not (left and top):
            raise ValueError("chroma Plane without both neighbors")
        hsum = sum(
            (x + 1) * (p[y0 - 1, x0 + 4 + x] - p[y0 - 1, x0 + 2 - x])
            for x in range(4)
        )
        vsum = sum(
            (y + 1) * (p[y0 + 4 + y, x0 - 1] - p[y0 + 2 - y, x0 - 1])
            for y in range(4)
        )
        a = 16 * (p[y0 + 7, x0 - 1] + p[y0 - 1, x0 + 7])
        b = (17 * hsum + 16) >> 5
        c = (17 * vsum + 16) >> 5
        ys, xs = np.mgrid[0:8, 0:8]
        return np.clip((a + b * (xs - 3) + c * (ys - 3) + 16) >> 5, 0, 255)
    if mode != 0:
        raise ValueError(f"bad intra chroma prediction mode {mode}")
    out = np.empty((8, 8), dtype=np.int64)
    for qy in (0, 4):
        for qx in (0, 4):
            tvals = p[y0 - 1, x0 + qx : x0 + qx + 4] if top else None
            lvals = p[y0 + qy : y0 + qy + 4, x0 - 1] if left else None
            corner = (qx == 0 and qy == 0) or (qx == 4 and qy == 4)
            if corner and top and left:
                dc = (int(tvals.sum()) + int(lvals.sum()) + 4) >> 3
            elif qx == 4 and qy == 0:
                if top:
                    dc = (int(tvals.sum()) + 2) >> 2
                elif left:
                    dc = (int(lvals.sum()) + 2) >> 2
                else:
                    dc = 128
            elif qx == 0 and qy == 4:
                if left:
                    dc = (int(lvals.sum()) + 2) >> 2
                elif top:
                    dc = (int(tvals.sum()) + 2) >> 2
                else:
                    dc = 128
            else:  # (0,0) / (4,4) with one or zero neighbors
                if left and not top:
                    dc = (int(lvals.sum()) + 2) >> 2
                elif top and not left:
                    dc = (int(tvals.sum()) + 2) >> 2
                elif not top and not left:
                    dc = 128
                else:
                    dc = (int(tvals.sum()) + int(lvals.sum()) + 4) >> 3
            out[qy : qy + 4, qx : qx + 4] = dc
    return out


# ---------------------------------------------------------------------------
# Intra_4x4 (8.3.1): per-4x4-block prediction, all nine modes, plus
# the coded_block_pattern me(v) mapping (Table 9-4, intra column).
# ---------------------------------------------------------------------------

# codeNum -> CBP for Intra_4x4 / Intra_8x8 macroblocks (Table 9-4).
# Pinned a PERMUTATION of 0..47 by tests; the short codes (the CBPs
# real intra streams emit constantly: 47/31/15/0 and the per-8x8
# singles) are the extensively-published head of the table.
_CBP_INTRA_FROM_CODE = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14,
    39, 43, 45, 46, 16, 3, 5, 10, 12, 19, 21, 26,
    28, 35, 37, 42, 44, 1, 2, 4, 8, 17, 18, 20,
    24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
_CBP_INTRA_TO_CODE = {v: i for i, v in enumerate(_CBP_INTRA_FROM_CODE)}


def _pred_4x4(
    mode: int,
    plane: np.ndarray,
    x0: int,
    y0: int,
    left: bool,
    top: bool,
    top_left: bool,
    top_right: bool,
) -> np.ndarray:
    """Intra_4x4 sample prediction (8.3.1.2.1-9), all nine modes, on
    the reconstructed plane at absolute (x0, y0). When the top-right
    samples are unavailable but the top row is, they substitute the
    rightmost top sample (8.3.1.2)."""
    p = plane.astype(np.int64)
    # neighbor vectors: t[0..7] = p[x0..x0+7, y0-1], l[0..3], tl
    t = np.zeros(8, dtype=np.int64)
    lv = np.zeros(4, dtype=np.int64)
    tl = 0
    if top:
        t[0:4] = p[y0 - 1, x0 : x0 + 4]
        if top_right:
            t[4:8] = p[y0 - 1, x0 + 4 : x0 + 8]
        else:
            t[4:8] = t[3]
    if left:
        lv[:] = p[y0 : y0 + 4, x0 - 1]
    if top_left:
        tl = int(p[y0 - 1, x0 - 1])
    out = np.empty((4, 4), dtype=np.int64)
    if mode == 0:  # Vertical
        if not top:
            raise ValueError("Intra_4x4 Vertical without top")
        out[:] = t[0:4]
        return out
    if mode == 1:  # Horizontal
        if not left:
            raise ValueError("Intra_4x4 Horizontal without left")
        out[:] = lv.reshape(4, 1)
        return out
    if mode == 2:  # DC
        if top and left:
            dc = (int(t[0:4].sum()) + int(lv.sum()) + 4) >> 3
        elif left:
            dc = (int(lv.sum()) + 2) >> 2
        elif top:
            dc = (int(t[0:4].sum()) + 2) >> 2
        else:
            dc = 128
        out[:] = dc
        return out
    if mode == 3:  # Diagonal-Down-Left
        if not top:
            raise ValueError("Intra_4x4 DDL without top")
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    out[y, x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    out[y, x] = (
                        t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2
                    ) >> 2
        return out
    if mode == 4:  # Diagonal-Down-Right
        if not (top and left and top_left):
            raise ValueError("Intra_4x4 DDR without full top-left context")
        for y in range(4):
            for x in range(4):
                if x > y:
                    v = [tl if i < 0 else int(t[i]) for i in
                         (x - y - 2, x - y - 1, x - y)]
                    out[y, x] = (v[0] + 2 * v[1] + v[2] + 2) >> 2
                elif x < y:
                    v = [tl if i < 0 else int(lv[i]) for i in
                         (y - x - 2, y - x - 1, y - x)]
                    out[y, x] = (v[0] + 2 * v[1] + v[2] + 2) >> 2
                else:
                    out[y, x] = (int(t[0]) + 2 * tl + int(lv[0]) + 2) >> 2
        return out
    if mode == 5:  # Vertical-Right
        if not (top and left and top_left):
            raise ValueError("Intra_4x4 VR without full top-left context")
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    i = x - (y >> 1)
                    a = tl if i - 1 < 0 else int(t[i - 1])
                    b = int(t[i]) if i >= 0 else tl
                    out[y, x] = (a + b + 1) >> 1
                elif z >= 0:
                    i = x - (y >> 1)
                    v = [tl if j < 0 else int(t[j]) for j in (i - 2, i - 1, i)]
                    out[y, x] = (v[0] + 2 * v[1] + v[2] + 2) >> 2
                elif z == -1:
                    out[y, x] = (int(lv[0]) + 2 * tl + int(t[0]) + 2) >> 2
                else:
                    out[y, x] = (
                        int(lv[y - 2 * x - 1])
                        + 2 * int(lv[y - 2 * x - 2])
                        + (tl if y - 2 * x - 3 < 0 else int(lv[y - 2 * x - 3]))
                        + 2
                    ) >> 2
        return out
    if mode == 6:  # Horizontal-Down
        if not (top and left and top_left):
            raise ValueError("Intra_4x4 HD without full top-left context")
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    i = y - (x >> 1)
                    a = tl if i - 1 < 0 else int(lv[i - 1])
                    b = int(lv[i]) if i >= 0 else tl
                    out[y, x] = (a + b + 1) >> 1
                elif z >= 0:
                    i = y - (x >> 1)
                    v = [tl if j < 0 else int(lv[j]) for j in (i - 2, i - 1, i)]
                    out[y, x] = (v[0] + 2 * v[1] + v[2] + 2) >> 2
                elif z == -1:
                    out[y, x] = (int(lv[0]) + 2 * tl + int(t[0]) + 2) >> 2
                else:
                    out[y, x] = (
                        int(t[x - 2 * y - 1])
                        + 2 * int(t[x - 2 * y - 2])
                        + (tl if x - 2 * y - 3 < 0 else int(t[x - 2 * y - 3]))
                        + 2
                    ) >> 2
        return out
    if mode == 7:  # Vertical-Left
        if not top:
            raise ValueError("Intra_4x4 VL without top")
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    out[y, x] = (t[i] + t[i + 1] + 1) >> 1
                else:
                    out[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
        return out
    if mode == 8:  # Horizontal-Up
        if not left:
            raise ValueError("Intra_4x4 HU without left")
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z > 5:
                    out[y, x] = int(lv[3])
                elif z == 5:
                    out[y, x] = (int(lv[2]) + 3 * int(lv[3]) + 2) >> 2
                elif z % 2 == 0:
                    i = y + (x >> 1)
                    out[y, x] = (int(lv[i]) + int(lv[i + 1]) + 1) >> 1
                else:
                    i = y + (x >> 1)
                    out[y, x] = (
                        int(lv[i]) + 2 * int(lv[i + 1]) + int(lv[i + 2]) + 2
                    ) >> 2
        return out
    raise ValueError(f"bad Intra_4x4 prediction mode {mode}")


# ---------------------------------------------------------------------------
# slice decode (I slices, CAVLC)
# ---------------------------------------------------------------------------

def _z_luma(idx: int) -> tuple[int, int]:
    """luma4x4BlkIdx z-scan -> (bx, by) in 4x4 units: quadrant =
    idx//4 raster in the 2x2 of 8x8 quadrants, sub-position idx%4
    raster within the quadrant (6.4.3)."""
    quad, sub = divmod(idx, 4)
    bx = (quad % 2) * 2 + sub % 2
    by = (quad // 2) * 2 + sub // 2
    return bx, by


def _nc_from_neighbors(
    tc_grid: np.ndarray, bx: int, by: int, left_ok: bool, top_ok: bool
) -> int:
    """9.2.1: nC from the left/top 4x4 blocks' TotalCoeff."""
    has_a = bx > 0 or left_ok
    has_b = by > 0 or top_ok
    na = int(tc_grid[by, bx - 1]) if has_a else 0
    nb = int(tc_grid[by - 1, bx]) if has_b else 0
    if has_a and has_b:
        return (na + nb + 1) >> 1
    if has_a:
        return na
    if has_b:
        return nb
    return 0


def _new_picture_state(sps: dict) -> dict:
    """Fresh decoded-picture state shared by the slices of one
    picture (round 16: multi-slice support)."""
    w_mbs, h_mbs = sps["width_mbs"], sps["height_mbs"]
    return {
        "y": np.zeros((h_mbs * 16, w_mbs * 16), dtype=np.uint8),
        "cb": np.zeros((h_mbs * 8, w_mbs * 8), dtype=np.uint8),
        "cr": np.zeros((h_mbs * 8, w_mbs * 8), dtype=np.uint8),
        "luma_tc": np.zeros((h_mbs * 4, w_mbs * 4), dtype=np.int64),
        "chroma_tc": np.zeros((2, h_mbs * 2, w_mbs * 2), dtype=np.int64),
        # per-4x4 Intra_4x4 modes for 8.3.1.1 MPM; non-I4x4 counts DC
        "i4_modes": np.full((h_mbs * 4, w_mbs * 4), 2, dtype=np.int64),
        # per-MB luma QP for deblocking (I_PCM counts as 0)
        "qp_map": np.zeros((h_mbs, w_mbs), dtype=np.int64),
        # per-4x4 motion state: ref (-2 undecoded, -1 intra, 0 inter)
        "ref4": np.full(
            (h_mbs * 4, w_mbs * 4), _REF_UNAVAIL, dtype=np.int64
        ),
        "mv4": np.zeros((2, h_mbs * 4, w_mbs * 4), dtype=np.int64),
        # slice index per MB (-1 undecoded) + per-slice deblock params
        "slice_map": np.full((h_mbs, w_mbs), -1, dtype=np.int64),
        "slice_params": [],   # (deblock_idc, off_a, off_b) per slice
        "next_mb": 0,         # raster cursor: slices must be contiguous
        "any_p": False,
    }


def decode_idr_planes(
    slice_rbsp: bytes, sps: dict, pps: dict, nal_type: int,
    nal_ref_idc: int, ref_planes: tuple | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a SINGLE-slice I/IDR or single-reference P picture;
    returns uncropped (Y, Cb, Cr) uint8 planes.  ``ref_planes`` is
    the previously decoded picture's uncropped plane triple (the
    in-loop, post-deblocking output), required for P slices.
    Multi-slice pictures go through decode_picture_slices."""
    st = _new_picture_state(sps)
    decode_slice_into(st, slice_rbsp, sps, pps, nal_type, nal_ref_idc,
                      ref_planes)
    if st["next_mb"] != sps["width_mbs"] * sps["height_mbs"]:
        raise ValueError("slice ended before covering the picture")
    return _finalize_picture(st, pps)


def decode_picture_slices(
    slice_rbsps: list, sps: dict, pps: dict, nal_type: int,
    nal_ref_idc: int, ref_planes: tuple | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one picture coded as one or more slices (round 16):
    each slice covers a contiguous raster run of macroblocks starting
    at its first_mb_in_slice; intra prediction, CAVLC nC and motion
    prediction treat other-slice neighbors as unavailable (6.4.8),
    and deblocking honors each macroblock's own slice's
    disable_deblocking_filter_idc / alpha/beta offsets, with idc 2
    skipping slice-boundary edges."""
    st = _new_picture_state(sps)
    for rbsp in slice_rbsps:
        decode_slice_into(st, rbsp, sps, pps, nal_type, nal_ref_idc,
                          ref_planes)
    if st["next_mb"] != sps["width_mbs"] * sps["height_mbs"]:
        raise ValueError("slices do not cover the whole picture")
    return _finalize_picture(st, pps)


def decode_slice_into(
    st: dict, slice_rbsp: bytes, sps: dict, pps: dict, nal_type: int,
    nal_ref_idc: int, ref_planes: tuple | None = None,
) -> None:
    """Parse and decode ONE slice into picture state ``st``."""
    br = _BitReader(slice_rbsp)
    first_mb = br.ue()
    if first_mb != st["next_mb"]:
        raise ValueError(
            f"slice first_mb {first_mb} != expected {st['next_mb']} "
            "(slices must tile the picture in raster order)"
        )
    slice_type = br.ue()
    st_kind = slice_type % 5
    if st_kind not in (0, 2):
        raise NotImplementedError(
            f"slice_type {slice_type} (I and single-ref P slices decode)"
        )
    is_p = st_kind == 0
    if is_p and ref_planes is None:
        raise ValueError("P slice without a decoded reference picture")
    if br.ue() != pps["pps_id"]:
        raise ValueError("slice references unknown PPS")
    br.u(sps["log2_max_frame_num"])  # frame_num
    if nal_type == 5:
        br.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        br.u(sps["log2_max_poc_lsb"])
        if pps["bottom_poc"]:
            br.se()
    if pps["redundant"]:
        br.ue()
    # normalize the reference input: a single plane triple (the
    # round-16 single-ref API) or a most-recent-first LIST of triples
    # (multiple reference frames); P default list order for frames is
    # descending frame order, which the caller's insert-at-front
    # maintains.
    refs: list = []
    if ref_planes is not None:
        if isinstance(ref_planes, tuple):
            refs = [ref_planes]
        else:
            refs = list(ref_planes)
    num_ref = 1
    if is_p:
        num_ref = pps["num_ref_l0_default"]
        if br.u(1):  # num_ref_idx_active_override_flag
            num_ref = br.ue() + 1
        if num_ref > len(refs):
            raise ValueError(
                f"P slice wants {num_ref} reference frames; only "
                f"{len(refs)} decoded"
            )
        if br.u(1):  # ref_pic_list_modification_flag_l0
            raise NotImplementedError("reference picture list modification")
    # explicit weighted prediction (7.3.3.2 + 8.4.2.3, round 16):
    # per-reference (weight, offset) with a shared log2 denominator;
    # weights[i] is None for default (identity) prediction
    wp_luma: list = [None] * max(1, num_ref)
    wp_cb: list = [None] * max(1, num_ref)
    wp_cr: list = [None] * max(1, num_ref)
    luma_denom = chroma_denom = 0
    if is_p and pps["weighted_pred"]:
        luma_denom = br.ue()
        chroma_denom = br.ue()
        for i in range(num_ref):
            if br.u(1):  # luma_weight_l0_flag
                wp_luma[i] = (br.se(), br.se())
            if br.u(1):  # chroma_weight_l0_flag
                wp_cb[i] = (br.se(), br.se())
                wp_cr[i] = (br.se(), br.se())
    if nal_ref_idc:
        if nal_type == 5:
            br.u(1)  # no_output_of_prior_pics
            br.u(1)  # long_term_reference
        else:
            if br.u(1):
                raise NotImplementedError("adaptive ref pic marking")
    qp = pps["init_qp"] + br.se()
    # deblocking control (7.3.3 + 8.7, round 16): idc 0 filters every
    # edge, 1 disables, 2 skips slice-boundary edges — identical to 0
    # for the single-slice pictures this decoder accepts. A PPS
    # without deblocking_filter_control_present_flag means idc 0 with
    # zero offsets.
    deblock_idc, off_a, off_b = 0, 0, 0
    if pps["deblock_ctrl"]:
        deblock_idc = br.ue()
        if deblock_idc > 2:
            raise ValueError(
                f"bad disable_deblocking_filter_idc {deblock_idc}"
            )
        if deblock_idc != 1:
            off_a = 2 * br.se()  # slice_alpha_c0_offset_div2
            off_b = 2 * br.se()  # slice_beta_offset_div2

    w_mbs, h_mbs = sps["width_mbs"], sps["height_mbs"]
    y_plane, cb_plane, cr_plane = st["y"], st["cb"], st["cr"]
    luma_tc, chroma_tc = st["luma_tc"], st["chroma_tc"]
    i4_modes, qp_map = st["i4_modes"], st["qp_map"]
    ref4, mv4, slice_map = st["ref4"], st["mv4"], st["slice_map"]
    cur_slice = len(st["slice_params"])
    st["slice_params"].append((deblock_idc, off_a, off_b))
    st["any_p"] = st["any_p"] or is_p
    refs_i64 = [
        tuple(p.astype(np.int64) for p in planes) for planes in refs
    ]

    def te_ref() -> int:
        """te(v) with cMax = num_ref - 1 (9.1.1): absent when one
        reference, an INVERTED single bit for two, ue(v) beyond."""
        if num_ref == 1:
            return 0
        if num_ref == 2:
            return 1 - br.u(1)
        return br.ue()

    def mb_avail(mbx, mby):
        """6.4.8: a neighbor macroblock is available only inside the
        picture AND in the CURRENT slice."""
        if mbx < 0 or mby < 0 or mbx >= w_mbs or mby >= h_mbs:
            return False
        return int(slice_map[mby, mbx]) == cur_slice
    # z-indices whose above-right in-MB neighbor is decoded LATER in
    # z-order (6.4.12.2): their top-right samples are unavailable
    _TR_UNAVAIL_Z = {3, 7, 11, 13, 15}

    def decode_chroma(
        chroma_mode, cbp_chroma, qpc, mbx, mby, left_ok, top_ok,
        pred_mc=None,
    ):
        cx0, cy0 = mbx * 8, mby * 8
        for ci, plane in ((0, cb_plane), (1, cr_plane)):
            if pred_mc is not None:  # inter MB: motion-compensated pred
                predc = pred_mc[ci]
            else:
                predc = _pred_chroma(
                    chroma_mode, plane, cx0, cy0, left_ok, top_ok
                )
            if cbp_chroma > 0:
                dcc_scan = _decode_residual_block(br, -1, 4)
                dcc = np.array(
                    [[dcc_scan[0], dcc_scan[1]], [dcc_scan[2], dcc_scan[3]]],
                    dtype=np.int64,
                )
                h2 = np.array([[1, 1], [1, -1]], dtype=np.int64)
                dcc = _dequant_chroma_dc(h2 @ dcc @ h2, qpc)
            else:
                dcc = np.zeros((2, 2), dtype=np.int64)
            reconc = predc.copy()
            for by in range(2):
                for bx in range(2):
                    if cbp_chroma == 2:
                        nc = _nc_from_neighbors(
                            chroma_tc[ci],
                            mbx * 2 + bx,
                            mby * 2 + by,
                            left_ok,
                            top_ok,
                        )
                        ac_scan = _decode_residual_block(br, nc, 15)
                        chroma_tc[ci, mby * 2 + by, mbx * 2 + bx] = sum(
                            1 for c in ac_scan if c
                        )
                        d = _dequant_ac(_scan_to_block(ac_scan, start=1), qpc)
                    else:
                        chroma_tc[ci, mby * 2 + by, mbx * 2 + bx] = 0
                        d = np.zeros((4, 4), dtype=np.int64)
                    d[0, 0] = dcc[by, bx]
                    r = (_inverse_core_4x4(d) + 32) >> 6
                    reconc[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] += r
            plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(reconc, 0, 255)

    def mc_luma_parts(mbx, mby, parts):
        """Motion-compensate the luma 16x16 prediction from partition
        list [(gx_off4, gy_off4, pw4, ph4, mvx, mvy, ridx)] (4x4
        units; ridx picks the reference picture)."""
        pred = np.zeros((16, 16), dtype=np.int64)
        for gx_o, gy_o, pw4, ph4, mvx, mvy, ridx in parts:
            pred[
                gy_o * 4 : (gy_o + ph4) * 4, gx_o * 4 : (gx_o + pw4) * 4
            ] = _apply_weight(
                _interp_luma_block(
                    refs_i64[ridx][0], mbx * 16 + gx_o * 4,
                    mby * 16 + gy_o * 4, pw4 * 4, ph4 * 4, mvx, mvy,
                ),
                wp_luma[ridx], luma_denom,
            )
        return pred

    def mc_chroma_parts(mbx, mby, parts):
        preds = []
        for ci, wp_c in ((1, wp_cb), (2, wp_cr)):
            pc = np.zeros((8, 8), dtype=np.int64)
            for gx_o, gy_o, pw4, ph4, mvx, mvy, ridx in parts:
                pc[
                    gy_o * 2 : (gy_o + ph4) * 2, gx_o * 2 : (gx_o + pw4) * 2
                ] = _apply_weight(
                    _interp_chroma_block(
                        refs_i64[ridx][ci], mbx * 8 + gx_o * 2,
                        mby * 8 + gy_o * 2, pw4 * 2, ph4 * 2, mvx, mvy,
                    ),
                    wp_c[ridx], chroma_denom,
                )
            preds.append(pc)
        return preds

    def set_motion(mbx, mby, gx_o, gy_o, pw4, ph4, mvx, mvy, ridx=0):
        gy, gx = mby * 4 + gy_o, mbx * 4 + gx_o
        ref4[gy : gy + ph4, gx : gx + pw4] = ridx
        mv4[0, gy : gy + ph4, gx : gx + pw4] = mvx
        mv4[1, gy : gy + ph4, gx : gx + pw4] = mvy

    def decode_skip_mb(mb):
        mbx, mby = mb % w_mbs, mb // w_mbs
        mvx, mvy = _mv_skip(mv4, ref4, mbx * 4, mby * 4, min_mb=first_mb)
        part = [(0, 0, 4, 4, mvx, mvy, 0)]
        y_plane[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = (
            np.clip(mc_luma_parts(mbx, mby, part), 0, 255)
        )
        pcb, pcr = mc_chroma_parts(mbx, mby, part)
        cb_plane[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = np.clip(
            pcb, 0, 255
        )
        cr_plane[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = np.clip(
            pcr, 0, 255
        )
        set_motion(mbx, mby, 0, 0, 4, 4, mvx, mvy)
        luma_tc[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 0
        chroma_tc[:, mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
        qp_map[mby, mbx] = qp
        slice_map[mby, mbx] = cur_slice

    def decode_inter_mb(mb, p_type):
        nonlocal qp
        mbx, mby = mb % w_mbs, mb // w_mbs
        left_ok = mb_avail(mbx - 1, mby)
        top_ok = mb_avail(mbx, mby - 1)
        slice_map[mby, mbx] = cur_slice
        x0, y0 = mbx * 16, mby * 16
        if p_type > 4:
            raise ValueError(f"bad P mb_type {p_type}")
        if p_type in (3, 4):  # P_8x8 / P_8x8ref0 (Table 7-17)
            subs = [br.ue() for _ in range(4)]
            if any(s > 3 for s in subs):
                raise ValueError(f"bad P sub_mb_type in {subs}")
            # ref_idx_l0 per 8x8 (7.3.5.2); P_8x8ref0 forces 0
            refs_8x8 = [
                0 if p_type == 4 else te_ref() for _ in range(4)
            ]
            geo = []
            for i8, s in enumerate(subs):
                ox, oy = (i8 % 2) * 2, (i8 // 2) * 2
                shapes = {
                    0: [(0, 0, 2, 2)],
                    1: [(0, 0, 2, 1), (0, 1, 2, 1)],  # two 8x4
                    2: [(0, 0, 1, 2), (1, 0, 1, 2)],  # two 4x8
                    3: [(0, 0, 1, 1), (1, 0, 1, 1),
                        (0, 1, 1, 1), (1, 1, 1, 1)],  # four 4x4
                }[s]
                geo.extend(
                    (ox + sx, oy + sy, pw, ph, None, refs_8x8[i8])
                    for sx, sy, pw, ph in shapes
                )
        else:
            # partition geometry in 4x4 units + the 8.4.1.3 mvp
            # hints; ref_idx_l0 parses for ALL partitions first
            # (7.3.5.1 loop order), then all mvds
            raw_geo = {
                0: [(0, 0, 4, 4, None)],
                1: [(0, 0, 4, 2, "top"), (0, 2, 4, 2, "bottom")],
                2: [(0, 0, 2, 4, "left"), (2, 0, 2, 4, "right")],
            }[p_type]
            part_refs = [te_ref() for _ in raw_geo]
            geo = [g + (r,) for g, r in zip(raw_geo, part_refs)]
        mvds = [(br.se(), br.se()) for _ in geo]
        parts = []
        for (gx_o, gy_o, pw4, ph4, hint, ridx), (mdx, mdy) in zip(
            geo, mvds
        ):
            if ridx >= len(refs_i64):
                raise ValueError(f"ref_idx {ridx} beyond reference list")
            mvpx, mvpy = _mvp_median(
                mv4, ref4, mbx * 4 + gx_o, mby * 4 + gy_o, pw4, ph4,
                ref_idx=ridx, part_hint=hint, min_mb=first_mb,
            )
            mvx, mvy = mvpx + mdx, mvpy + mdy
            set_motion(mbx, mby, gx_o, gy_o, pw4, ph4, mvx, mvy, ridx)
            parts.append((gx_o, gy_o, pw4, ph4, mvx, mvy, ridx))
        pred = mc_luma_parts(mbx, mby, parts)
        code = br.ue()
        if code >= 48:
            raise ValueError(f"bad inter coded_block_pattern code {code}")
        cbp = _CBP_INTER_FROM_CODE[code]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            qp = (qp + br.se() + 52) % 52
        qpc = _chroma_qp(qp, pps["chroma_qp_off"])
        qp_map[mby, mbx] = qp
        recon = pred
        for idx in range(16):
            bx, by = _z_luma(idx)
            if cbp_luma & (1 << (idx // 4)):
                nc = _nc_from_neighbors(
                    luma_tc, mbx * 4 + bx, mby * 4 + by, left_ok, top_ok
                )
                scan = _decode_residual_block(br, nc, 16)
                luma_tc[mby * 4 + by, mbx * 4 + bx] = sum(
                    1 for c in scan if c
                )
                d = _dequant_ac(_scan_to_block(scan), qp)
                r = (_inverse_core_4x4(d) + 32) >> 6
                recon[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] += r
            else:
                luma_tc[mby * 4 + by, mbx * 4 + bx] = 0
        y_plane[y0 : y0 + 16, x0 : x0 + 16] = np.clip(recon, 0, 255)
        decode_chroma(
            0, cbp_chroma, qpc, mbx, mby, left_ok, top_ok,
            pred_mc=mc_chroma_parts(mbx, mby, parts),
        )

    def decode_macroblock(mb, mb_type):
        nonlocal qp
        mbx, mby = mb % w_mbs, mb // w_mbs
        left_ok = mb_avail(mbx - 1, mby)
        top_ok = mb_avail(mbx, mby - 1)
        slice_map[mby, mbx] = cur_slice
        x0, y0 = mbx * 16, mby * 16
        cx0, cy0 = mbx * 8, mby * 8
        # every intra path marks its 4x4 cells _REF_INTRA up front
        ref4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = _REF_INTRA
        if mb_type == 0:  # I_NxN == Intra_4x4 (no 8x8 transform flag
            # in baseline: PPS transform_8x8_mode is High-profile-only)
            modes = []
            for idx in range(16):
                bx, by = _z_luma(idx)
                gx, gy = mbx * 4 + bx, mby * 4 + by
                # 8.3.1.1: each unavailable/non-I4x4 side defaults to
                # DC (2) INDEPENDENTLY, then the MPM is the min;
                # blocks across a MB edge need that MB available
                # (same slice — 6.4.8)
                ma = (
                    int(i4_modes[gy, gx - 1])
                    if (bx > 0 or left_ok) else 2
                )
                mb_ = (
                    int(i4_modes[gy - 1, gx])
                    if (by > 0 or top_ok) else 2
                )
                pred_mode = min(ma, mb_)
                if br.u(1):  # prev_intra4x4_pred_mode_flag
                    mode = pred_mode
                else:
                    rem = br.u(3)
                    mode = rem if rem < pred_mode else rem + 1
                i4_modes[gy, gx] = mode
                modes.append(mode)
            chroma_mode = br.ue()
            code = br.ue()
            if code >= 48:
                raise ValueError(f"bad intra coded_block_pattern code {code}")
            cbp = _CBP_INTRA_FROM_CODE[code]
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            if cbp:
                qp = (qp + br.se() + 52) % 52
            qpc = _chroma_qp(qp, pps["chroma_qp_off"])
            qp_map[mby, mbx] = qp
            w_pix = w_mbs * 16
            for idx in range(16):
                bx, by = _z_luma(idx)
                x, y = x0 + 4 * bx, y0 + 4 * by
                s_left = bx > 0 or left_ok
                s_top = by > 0 or top_ok
                if bx > 0 and by > 0:
                    s_tl = True
                elif by > 0:  # bx == 0: top-left sample in left MB
                    s_tl = left_ok
                elif bx > 0:  # by == 0: in top MB
                    s_tl = top_ok
                else:         # MB corner: the top-left MB
                    s_tl = mb_avail(mbx - 1, mby - 1)
                if not s_top:
                    s_tr = False
                elif by == 0:
                    # above-right sample lives in the top (bx < 3) or
                    # top-right (bx == 3) macroblock
                    s_tr = (
                        mb_avail(mbx + 1, mby - 1) if bx == 3 else top_ok
                    )
                else:
                    s_tr = idx not in _TR_UNAVAIL_Z and (x + 4) < w_pix
                pred = _pred_4x4(
                    modes[idx], y_plane, x, y, s_left, s_top, s_tl, s_tr
                )
                if cbp_luma & (1 << (idx // 4)):
                    nc = _nc_from_neighbors(
                        luma_tc, mbx * 4 + bx, mby * 4 + by, left_ok, top_ok
                    )
                    scan = _decode_residual_block(br, nc, 16)
                    luma_tc[mby * 4 + by, mbx * 4 + bx] = sum(
                        1 for c in scan if c
                    )
                    d = _dequant_ac(_scan_to_block(scan), qp)
                    r = (_inverse_core_4x4(d) + 32) >> 6
                else:
                    luma_tc[mby * 4 + by, mbx * 4 + bx] = 0
                    r = 0
                y_plane[y : y + 4, x : x + 4] = np.clip(pred + r, 0, 255)
            decode_chroma(
                chroma_mode, cbp_chroma, qpc, mbx, mby, left_ok, top_ok
            )
            return
        if mb_type == 25:  # I_PCM (7.3.5, 7.4.5)
            br.byte_align()
            pcm = np.frombuffer(
                bytes(br.u(8) for _ in range(256 + 64 + 64)), dtype=np.uint8
            )
            y_plane[y0 : y0 + 16, x0 : x0 + 16] = pcm[:256].reshape(16, 16)
            cb_plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = pcm[256:320].reshape(8, 8)
            cr_plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = pcm[320:].reshape(8, 8)
            luma_tc[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
            chroma_tc[:, mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
            qp_map[mby, mbx] = 0  # I_PCM deblocks at QP 0 (8.7)
            return
        if mb_type > 25:
            raise ValueError(f"bad I-slice mb_type {mb_type}")
        # Intra_16x16 (Table 7-11): mb_type 1..24
        m = mb_type - 1
        pred_mode = m % 4
        cbp_chroma = (m // 4) % 3
        cbp_luma = 15 if m >= 12 else 0
        chroma_mode = br.ue()
        qp = (qp + br.se() + 52) % 52  # mb_qp_delta (7.4.5)
        qpc = _chroma_qp(qp, pps["chroma_qp_off"])
        qp_map[mby, mbx] = qp

        # --- luma ---
        pred = _pred_16x16(pred_mode, y_plane, x0, y0, left_ok, top_ok)
        nc = _nc_from_neighbors(
            luma_tc, mbx * 4, mby * 4, left_ok, top_ok
        )
        dc_scan = _decode_residual_block(br, nc, 16)
        dc_blk = _scan_to_block(dc_scan)
        dc_vals = _dequant_luma_dc(_hadamard4(dc_blk), qp)
        recon = pred.copy()
        for idx in range(16):
            bx, by = _z_luma(idx)
            if cbp_luma:
                nc = _nc_from_neighbors(
                    luma_tc, mbx * 4 + bx, mby * 4 + by, left_ok, top_ok
                )
                ac_scan = _decode_residual_block(br, nc, 15)
                luma_tc[mby * 4 + by, mbx * 4 + bx] = sum(
                    1 for c in ac_scan if c
                )
                d = _dequant_ac(_scan_to_block(ac_scan, start=1), qp)
            else:
                luma_tc[mby * 4 + by, mbx * 4 + bx] = 0
                d = np.zeros((4, 4), dtype=np.int64)
            d[0, 0] = dc_vals[by, bx]
            r = (_inverse_core_4x4(d) + 32) >> 6
            recon[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] += r
        y_plane[y0 : y0 + 16, x0 : x0 + 16] = np.clip(recon, 0, 255)
        decode_chroma(chroma_mode, cbp_chroma, qpc, mbx, mby, left_ok, top_ok)

    total = w_mbs * h_mbs
    mb_addr = first_mb
    if is_p:
        # slice_data for P (7.3.4, CAVLC): runs of P_Skip macroblocks
        # interleave with coded ones; a trailing run may end the slice
        while mb_addr < total:
            skip_run = br.ue()
            if mb_addr + skip_run > total:
                raise ValueError("mb_skip_run overruns the picture")
            for _ in range(skip_run):
                decode_skip_mb(mb_addr)
                mb_addr += 1
            if mb_addr >= total or not br.more_rbsp_data():
                break
            raw = br.ue()
            if raw < 5:
                decode_inter_mb(mb_addr, raw)
            else:
                decode_macroblock(mb_addr, raw - 5)  # intra in P
            mb_addr += 1
    else:
        # I slice_data: macroblocks until the slice's data ends
        while mb_addr < total:
            decode_macroblock(mb_addr, br.ue())
            mb_addr += 1
            if not br.more_rbsp_data():
                break
    if mb_addr == first_mb:
        raise ValueError("slice decodes zero macroblocks")
    st["next_mb"] = mb_addr


def _finalize_picture(
    st: dict, pps: dict
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the in-loop deblocking filter over the completed picture,
    honoring each macroblock's OWN slice's idc and alpha/beta offsets
    (idc 2 skips slice-boundary edges)."""
    y_plane, cb_plane, cr_plane = st["y"], st["cb"], st["cr"]
    params = st["slice_params"]
    if all(p[0] == 1 for p in params):  # every slice disabled it
        return y_plane, cb_plane, cr_plane
    bs_v = bs_h = None
    if st["any_p"]:  # inter strengths need the per-4x4 motion state
        bs_v, bs_h = _deblock_bs_grids(
            st["ref4"], st["luma_tc"], st["mv4"]
        )
    if len(params) == 1:
        idc, off_a, off_b = params[0]
        if idc == 1:
            return y_plane, cb_plane, cr_plane
        return _deblock_frame(
            y_plane, cb_plane, cr_plane, st["qp_map"],
            pps["chroma_qp_off"], off_a, off_b, bs_v, bs_h,
        )
    return _deblock_frame(
        y_plane, cb_plane, cr_plane, st["qp_map"],
        pps["chroma_qp_off"], 0, 0, bs_v, bs_h,
        slice_map=st["slice_map"], slice_params=params,
    )


def _crop_planes(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, sps: dict
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cl, cr_, ct, cb_ = sps["crop"]
    h, w = y.shape
    y2 = y[2 * ct : h - 2 * cb_, 2 * cl : w - 2 * cr_]
    cbp = cb[ct : h // 2 - cb_, cl : w // 2 - cr_]
    crp = cr[ct : h // 2 - cb_, cl : w // 2 - cr_]
    if y2.size == 0:
        raise ValueError("cropping removes the whole picture")
    return y2, cbp, crp


# ---------------------------------------------------------------------------
# NAL plumbing: Annex-B and MP4 (avcC) framings
# ---------------------------------------------------------------------------


def split_annexb(data: bytes) -> list[bytes]:
    """Split an Annex-B elementary stream on 00 00 01 / 00 00 00 01
    start codes; returns raw NAL units (header byte included)."""
    nals = []
    i = 0
    n = len(data)
    starts = []
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no Annex-B start codes")
    for k, s in enumerate(starts):
        e = starts[k + 1] - 3 if k + 1 < len(starts) else n
        while e > s and data[e - 1] == 0:
            e -= 1  # trailing_zero_8bits / next start code prefix zeros
        if e > s:
            nals.append(data[s:e])
    return nals


def parse_avcc(entry_body: bytes) -> dict:
    """Parse the avcC (AVCDecoderConfigurationRecord, ISO/IEC 14496-15)
    out of an avc1 VisualSampleEntry body (bytes AFTER the 4CC).
    Returns {'sps': dict, 'pps': dict, 'length_size': int}."""
    # VisualSampleEntry fixed fields: 78 bytes after the 4CC, then
    # child boxes (avcC among them)
    pos = 78
    record = None
    while pos + 8 <= len(entry_body):
        size = struct.unpack_from(">I", entry_body, pos)[0]
        typ = entry_body[pos + 4 : pos + 8]
        if size < 8 or pos + size > len(entry_body):
            break
        if typ == b"avcC":
            record = entry_body[pos + 8 : pos + size]
            break
        pos += size
    if record is None or len(record) < 7:
        raise ValueError("avc1 sample entry without an avcC record")
    if record[0] != 1:
        raise ValueError(f"avcC configurationVersion {record[0]}")
    try:
        length_size = (record[4] & 3) + 1
        n_sps = record[5] & 0x1F
        pos = 6
        sps = pps = None
        for _ in range(n_sps):
            ln = struct.unpack_from(">H", record, pos)[0]
            nal = record[pos + 2 : pos + 2 + ln]
            pos += 2 + ln
            if nal and (nal[0] & 0x1F) == 7:
                sps = parse_sps(nal_to_rbsp(nal[1:]))
        n_pps = record[pos]
        pos += 1
        for _ in range(n_pps):
            ln = struct.unpack_from(">H", record, pos)[0]
            nal = record[pos + 2 : pos + 2 + ln]
            pos += 2 + ln
            if nal and (nal[0] & 0x1F) == 8:
                pps = parse_pps(nal_to_rbsp(nal[1:]))
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed avcC record: {exc}") from exc
    if sps is None or pps is None:
        raise ValueError("avcC record missing SPS or PPS")
    return {"sps": sps, "pps": pps, "length_size": length_size}


def _frame_dict(y: np.ndarray) -> dict:
    h, w = y.shape
    return {
        "width": int(w),
        "height": int(h),
        "mean_gray": float(np.mean(y.astype(np.float64))),
        # the cropped luma plane itself, for pixel-exact downstream
        # checks (scalar-only consumers ignore this key)
        "y": y,
    }


def _classify_nal(nal: bytes, cfg: dict):
    """Validate a NAL header; parameter-set / SEI NALs are consumed
    into ``cfg`` and return None; coded-slice NALs return
    (rbsp, typ, ref_idc, first_mb)."""
    if not nal:
        raise ValueError("empty NAL unit")
    if nal[0] & 0x80:
        raise ValueError("forbidden_zero_bit set")
    ref_idc = (nal[0] >> 5) & 3
    typ = nal[0] & 0x1F
    rbsp = nal_to_rbsp(nal[1:])
    if typ == 7:
        cfg["sps"] = parse_sps(rbsp)
        return None
    if typ == 8:
        cfg["pps"] = parse_pps(rbsp)
        return None
    if typ in (6, 9, 10, 11, 12):  # SEI / AUD / end markers / filler
        return None
    if typ in (1, 5):
        return rbsp, typ, ref_idc, _BitReader(rbsp).ue()
    raise ValueError(f"unsupported NAL unit type {typ}")


def _decode_picture_group(slices: list, cfg: dict) -> dict:
    """Decode the accumulated slices of ONE picture into a frame
    dict, updating the reference state in ``cfg``."""
    if cfg.get("sps") is None or cfg.get("pps") is None:
        raise ValueError("coded slice before SPS/PPS")
    typ, ref_idc = slices[0][1], slices[0][2]
    if any(s[1] != typ for s in slices):
        raise ValueError("mixed NAL types within one picture")
    yu, cbu, cru = decode_picture_slices(
        [s[0] for s in slices], cfg["sps"], cfg["pps"], typ, ref_idc,
        cfg.get("refs") or [],
    )
    if typ == 5:  # IDR resets the reference list (8.2.5.1)
        cfg["refs"] = []
    if ref_idc:  # reference pictures feed later P slices,
        # most-recent-first (the P default list order); sliding
        # window bounded by the SPS max_num_ref_frames
        cap = max(1, int(cfg["sps"].get("max_num_ref_frames", 1)))
        cfg["refs"] = ([(yu, cbu, cru)] + (cfg.get("refs") or []))[:cap]
    y, cb, cr = _crop_planes(yu, cbu, cru, cfg["sps"])
    d = _frame_dict(y)
    d["cb_mean"] = float(np.mean(cb.astype(np.float64)))
    d["cr_mean"] = float(np.mean(cr.astype(np.float64)))
    d["n_slices"] = len(slices)
    return d


def decode_avc_sample(sample: bytes, cfg: dict) -> dict:
    """Decode ONE MP4 avc1/avc3 sample (length-prefixed NAL units) to
    its frame. In-sample SPS/PPS updates are honored and PERSIST into
    ``cfg`` — the avc3 in-band-parameter-set contract, where only the
    first sync sample carries them. The sample's coded-slice NALs
    must form exactly ONE picture (round 16: several slices tiling
    the picture are fine; a SECOND picture starting in the same
    sample is rejected loudly)."""
    ls = cfg["length_size"]
    pos = 0
    slices: list = []
    while pos + ls <= len(sample):
        ln = int.from_bytes(sample[pos : pos + ls], "big")
        pos += ls
        if ln == 0 or pos + ln > len(sample):
            raise ValueError("bad NAL length prefix in avc1 sample")
        nal = sample[pos : pos + ln]
        pos += ln
        info = _classify_nal(nal, cfg)
        if info is not None:
            if info[3] == 0 and slices:
                raise NotImplementedError(
                    "multiple coded slices starting a new picture in "
                    "one avc1 sample (one frame per sample is the "
                    "documented contract)"
                )
            slices.append(info)
    if not slices:
        raise ValueError("avc1 sample contains no coded slice")
    return _decode_picture_group(slices, cfg)


def _decode_one_nal(nal: bytes, cfg: dict) -> dict | None:
    """Single-NAL convenience: parameter sets return None; a coded
    slice NAL must be a complete (single-slice) picture."""
    info = _classify_nal(nal, cfg)
    if info is None:
        return None
    return _decode_picture_group([info], cfg)


def decode_annexb(data: bytes) -> list[dict]:
    """Decode a raw Annex-B H.264 elementary stream; returns one
    frame dict per coded PICTURE (a picture is one or more slices —
    a slice with first_mb_in_slice 0 starts the next picture)."""
    cfg: dict = {"sps": None, "pps": None}
    frames = []
    pending: list = []
    for nal in split_annexb(data):
        info = _classify_nal(nal, cfg)
        if info is None:
            continue
        if info[3] == 0 and pending:
            frames.append(_decode_picture_group(pending, cfg))
            pending = []
        pending.append(info)
    if pending:
        frames.append(_decode_picture_group(pending, cfg))
    return frames


# ---------------------------------------------------------------------------
# fixture ENCODER — renders real baseline-intra bitstreams the same way
# the JPEG/MJPEG fixtures are rendered: solid-gray (optionally per-MB
# gray) Intra_16x16 DC pictures whose single luma-DC CAVLC coefficient
# is chosen so reconstruction is BIT-EXACT, plus I_PCM for arbitrary
# content. QP defaults to 12 (dequant step small enough that every
# gray 0..255 is exactly reachable; the encoder still verifies by
# search).
# ---------------------------------------------------------------------------


def _encode_sps(
    width: int, height: int, qp_unused: int = 0, num_ref_frames: int = 1
) -> bytes:
    if width % 2 or height % 2:
        raise ValueError("4:2:0 needs even dimensions")
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    crop_r = (w_mbs * 16 - width) // 2
    crop_b = (h_mbs * 16 - height) // 2
    bw = _BitWriter()
    bw.u(8, 66)  # profile_idc: Baseline
    bw.u(8, 0xC0)  # constraint_set0+1
    bw.u(8, 10)  # level 1.0
    bw.ue(0)  # sps_id
    bw.ue(0)  # log2_max_frame_num_minus4
    bw.ue(2)  # pic_order_cnt_type 2
    bw.ue(num_ref_frames)  # max_num_ref_frames
    bw.u(1, 0)  # gaps_in_frame_num
    bw.ue(w_mbs - 1)
    bw.ue(h_mbs - 1)
    bw.u(1, 1)  # frame_mbs_only
    bw.u(1, 1)  # direct_8x8_inference
    if crop_r or crop_b:
        bw.u(1, 1)
        bw.ue(0)
        bw.ue(crop_r)
        bw.ue(0)
        bw.ue(crop_b)
    else:
        bw.u(1, 0)
    bw.u(1, 0)  # vui
    bw.rbsp_trailing()
    return b"\x67" + rbsp_to_nal(bw.tobytes())


def _encode_pps(qp: int, weighted: bool = False) -> bytes:
    bw = _BitWriter()
    bw.ue(0)  # pps_id
    bw.ue(0)  # sps_id
    bw.u(1, 0)  # CAVLC
    bw.u(1, 0)  # bottom_field_pic_order
    bw.ue(0)  # num_slice_groups_minus1
    bw.ue(0)
    bw.ue(0)  # ref idx defaults
    bw.u(1, 1 if weighted else 0)  # weighted_pred
    bw.u(2, 0)  # weighted_bipred
    bw.se(qp - 26)  # pic_init_qp
    bw.se(0)  # pic_init_qs
    bw.se(0)  # chroma_qp_index_offset
    bw.u(1, 1)  # deblocking_filter_control_present
    bw.u(1, 0)  # constrained_intra_pred
    bw.u(1, 0)  # redundant_pic_cnt_present
    bw.rbsp_trailing()
    return b"\x68" + rbsp_to_nal(bw.tobytes())


def _dc_level_for_residual(
    residual: int, qp: int, nearest: bool = False
) -> int:
    """The single Intra16x16 luma-DC level whose decode reproduces
    ``residual`` on every pixel of the MB (constant block): search
    around the analytic estimate, verifying through the EXACT decoder
    dequant + inverse-transform arithmetic.  At coarse qp (>= 30 with
    the conformant x16 LevelScale) the dequant step exceeds one gray
    level so some residuals have no exact level — ``nearest=True``
    returns the closest representable one instead of raising."""
    if residual == 0:
        return 0
    ls = 16 * _LS_V[qp % 6][0]
    qp6 = qp // 6

    def recon(level: int) -> int:
        # InvHadamard of level at (0,0) puts `level` in every cell
        if qp >= 36:
            dc = (level * ls) << (qp6 - 6)
        else:
            dc = (level * ls + (1 << (5 - qp6))) >> (6 - qp6)
        # constant DC-only 4x4 inverse core leaves dc everywhere
        return (dc + 32) >> 6

    est = round(residual * 64 * (1 << (6 - qp6 if qp < 36 else 0)) / ls)
    if qp >= 36:
        est = round(residual * 64 / (ls << (qp6 - 6)))
    best, best_err = 0, abs(residual)
    # the analytic estimate is within a few levels of optimal; recon is
    # monotone in level, so a short scan around it finds the nearest
    for delta in range(0, 64 if nearest else 4000):
        for cand in (est - delta, est + delta):
            err = abs(recon(cand) - residual)
            if err == 0:
                return cand
            if err < best_err:
                best, best_err = cand, err
    if nearest:
        return best
    raise ValueError(f"no exact DC level for residual {residual} at qp {qp}")


def encode_gray_idr(
    width: int,
    height: int,
    gray: int,
    qp: int = 12,
    per_mb: list | None = None,
    return_plane: bool = False,
):
    """One IDR NAL: every MB Intra_16x16 DC-mode with a single exact
    luma-DC coefficient. ``per_mb`` optionally gives one gray per MB
    (raster order) — neighbor prediction then makes most MBs carry a
    real nonzero CAVLC level, exercising coeff_token/total_zeros/
    run_before beyond the trivial rows."""
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    grays = per_mb if per_mb is not None else [gray] * (w_mbs * h_mbs)
    if len(grays) != w_mbs * h_mbs:
        raise ValueError("per_mb length mismatch")
    bw = _BitWriter()
    bw.ue(0)  # first_mb_in_slice
    bw.ue(7)  # slice_type: I (all slices)
    bw.ue(0)  # pps_id
    bw.u(4, 0)  # frame_num (log2_max_frame_num = 4)
    bw.ue(0)  # idr_pic_id
    bw.u(1, 0)  # no_output_of_prior_pics
    bw.u(1, 0)  # long_term_reference
    bw.se(0)  # slice_qp_delta
    bw.ue(1)  # disable_deblocking_filter_idc = 1
    # reconstruction-tracking encode: predict from RECONSTRUCTED
    # neighbors exactly as the decoder will
    recon = np.zeros((h_mbs * 16, w_mbs * 16), dtype=np.int64)
    for mb in range(w_mbs * h_mbs):
        mbx, mby = mb % w_mbs, mb // w_mbs
        x0, y0 = mbx * 16, mby * 16
        left_ok, top_ok = mbx > 0, mby > 0
        pred = _pred_16x16(2, recon, x0, y0, left_ok, top_ok)
        target = grays[mb]
        residual = int(target) - int(pred[0, 0])
        # exact at fine qp; nearest representable at coarse qp where
        # the conformant dequant step exceeds one gray level
        level = _dc_level_for_residual(residual, qp, nearest=True)
        bw.ue(3)  # mb_type: Intra_16x16, DC pred, cbp 0/0
        bw.ue(0)  # intra_chroma_pred_mode: DC
        bw.se(0)  # mb_qp_delta
        scan = [0] * 16
        scan[0] = level
        _encode_residual_block(bw, scan, 0, 16)  # nC always 0 here (AC=0)
        # track reconstruction
        if level:
            ls = 16 * _LS_V[qp % 6][0]
            qp6 = qp // 6
            if qp >= 36:
                dc = (level * ls) << (qp6 - 6)
            else:
                dc = (level * ls + (1 << (5 - qp6))) >> (6 - qp6)
            r = (dc + 32) >> 6
        else:
            r = 0
        recon[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred + r, 0, 255)
    bw.rbsp_trailing()
    nal = b"\x65" + rbsp_to_nal(bw.tobytes())
    if return_plane:
        return nal, recon[:height, :width].astype(np.uint8)
    return nal


def encode_i4x4_idr(
    width: int,
    height: int,
    gray: int,
    qp: int = 12,
    per_block: np.ndarray | None = None,
) -> bytes:
    """One IDR NAL of pure I_NxN (Intra_4x4) macroblocks, every 4x4
    block DC-mode with a DC-only residual chosen EXACT through the
    8.5.12.1 full-block dequant (position-class 0 scaling — unlike
    Intra_16x16 there is no separate Hadamard DC plane). ``per_block``
    optionally gives one target gray per 4x4 block ((h_mbs*4, w_mbs*4)
    raster): neighbor-dependent DC prediction then makes interior
    blocks carry real nonzero CAVLC levels with live nC bookkeeping.
    Exercises: the prev_intra4x4_pred_mode most-probable-mode
    derivation, the Table 9-4 me(v) coded_block_pattern, per-8x8-group
    residual gating, and per-4x4 sequential reconstruction."""
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    if per_block is None:
        per_block = np.full((h_mbs * 4, w_mbs * 4), gray, dtype=np.int64)
    per_block = np.asarray(per_block, dtype=np.int64)
    qp6 = qp // 6
    ls = _LS_V[qp % 6][0]

    def recon_r(level: int) -> int:
        # DC-only full-4x4 block: d00 = (level*ls) << qp6 (8.5.12.1),
        # constant through the inverse core, then (d+32)>>6
        return (((level * ls) << qp6) + 32) >> 6

    def level_for(residual: int) -> int:
        if residual == 0:
            return 0
        est = round(residual * 64 / (ls << qp6))
        for delta in range(0, 4000):
            for cand in (est - delta, est + delta):
                if recon_r(cand) == residual:
                    return cand
        raise ValueError(f"no exact I4x4 DC level for {residual} at qp {qp}")

    bw = _BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(4, 0)
    bw.ue(0)
    bw.u(1, 0)
    bw.u(1, 0)
    bw.se(0)
    bw.ue(1)
    recon = np.zeros((h_mbs * 16, w_mbs * 16), dtype=np.int64)
    luma_tc = np.zeros((h_mbs * 4, w_mbs * 4), dtype=np.int64)
    for mb in range(w_mbs * h_mbs):
        mbx, mby = mb % w_mbs, mb // w_mbs
        x0, y0 = mbx * 16, mby * 16
        left_ok, top_ok = mbx > 0, mby > 0
        # first pass: per-block levels via the decoder's own recon walk
        levels = [0] * 16
        blocks = []
        for idx in range(16):
            bx, by = _z_luma(idx)
            x, y = x0 + 4 * bx, y0 + 4 * by
            pred = _pred_4x4(2, recon, x, y, x > 0, y > 0, False, False)
            target = int(per_block[mby * 4 + by, mbx * 4 + bx])
            lvl = level_for(target - int(pred[0, 0]))
            levels[idx] = lvl
            r = recon_r(lvl) if lvl else 0
            recon[y : y + 4, x : x + 4] = np.clip(pred + r, 0, 255)
            blocks.append((bx, by))
        cbp_luma = 0
        for idx in range(16):
            if levels[idx]:
                cbp_luma |= 1 << (idx // 4)
        cbp = cbp_luma  # chroma untouched (gray)
        bw.ue(0)  # mb_type I_NxN
        for idx in range(16):
            bw.u(1, 1)  # prev_intra4x4_pred_mode_flag: all DC == MPM
        bw.ue(0)  # intra_chroma_pred_mode DC
        bw.ue(_CBP_INTRA_TO_CODE[cbp])
        if cbp:
            bw.se(0)  # mb_qp_delta
        for idx in range(16):
            if not (cbp_luma & (1 << (idx // 4))):
                continue
            bx, by = blocks[idx]
            nc = _nc_from_neighbors(
                luma_tc, mbx * 4 + bx, mby * 4 + by, left_ok, top_ok
            )
            scan = [0] * 16
            scan[0] = levels[idx]
            _encode_residual_block(bw, scan, nc, 16)
            luma_tc[mby * 4 + by, mbx * 4 + bx] = 1 if levels[idx] else 0
    bw.rbsp_trailing()
    return b"\x65" + rbsp_to_nal(bw.tobytes())


# Scan-order 4x4 residual level patterns for the textured I_NxN
# fixture: TotalCoeff sweeps 1..16 (so neighbor nC crosses every
# coeff_token context boundary: 2, 4, 8), zero runs exercise
# total_zeros + run_before (incl. the zeros_left > 6 escape), and the
# larger magnitudes walk the level_prefix/suffix ladder.
_TEXTURE_PATTERNS: list[list[int]] = [
    [2],                                              # tc 1
    [3, 1],                                           # tc 2, one T1
    [1, -1, 1],                                       # tc 3, all T1
    [2, 0, -1, 1, 1],                                 # tc 4 + gap
    [-4, 2, 1, 0, 0, 1, -1],                          # tc 5
    [2, -2, 0, 1, 1, 0, 0, -1, 1],                    # tc 6
    [3, 1, -2, 1, 1, 0, 1, -1, 1, 1],                 # tc 8
    [1, 2, -1, 1, -1, 1, 0, 1, -1, 1, 1, 0, 1],       # tc 10
    [1, -1, 2, 1, -1, 1, 1, -1, 1, 1, -1, 1, 1, -1, 1, 1],  # tc 16
    [0, 0, 0, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0, 1],       # run_before > 6
    [-9],                                             # suffix ladder
    [20, 1],                                          # bigger level
    [0, 1, 0, 0, -1, 0, 0, 0, 1],                     # scattered T1s
]


def encode_textured_i4x4_idr(
    width: int, height: int, seed: int, qp: int = 12,
    deblock: bool = False,
) -> tuple[bytes, np.ndarray, set]:
    """One IDR NAL of I_NxN macroblocks where EVERY 4x4 block carries
    a multi-coefficient CAVLC residual drawn deterministically from
    ``_TEXTURE_PATTERNS`` by (seed, block) — neighbor total_coeff
    bookkeeping then drives coeff_token through ALL FOUR contexts
    (0<=nC<2, 2<=nC<4, 4<=nC<8 — the round-16 Table 9-5 columns —
    and the nC>=8 fixed-length form). Returns (nal, expected luma
    plane computed through the decoder's exact 8.5.12.1 dequant +
    inverse-core arithmetic, set of context labels exercised).
    ``deblock=True`` signals disable_deblocking_filter_idc=0 so the
    decoder runs the 8.7 in-loop filter (round 16); the expected
    plane is then the filtered reconstruction."""
    nals, plane, ctxs = encode_textured_multislice_idr(
        width, height, seed, 1, qp, deblock_idc=(0 if deblock else 1)
    )
    return nals[0], plane, ctxs


def encode_textured_multislice_idr(
    width: int,
    height: int,
    seed: int,
    n_slices: int,
    qp: int = 12,
    deblock_idc: int = 1,
) -> tuple[list, np.ndarray, set]:
    """The textured I_NxN picture split into ``n_slices`` contiguous
    raster slices (round 16) — one IDR NAL per slice with its
    first_mb_in_slice, intra-prediction and CAVLC nC availability cut
    at slice boundaries (6.4.8), per-slice deblocking parameters
    (``deblock_idc`` 0 filters everything, 1 disables, 2 skips
    slice-boundary edges). Returns (nal list, expected cropped luma
    plane, coeff_token context labels exercised)."""
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    total = w_mbs * h_mbs
    n_slices = max(1, min(n_slices, total))
    bounds = [total * i // n_slices for i in range(n_slices + 1)]
    recon = np.zeros((h_mbs * 16, w_mbs * 16), dtype=np.int64)
    luma_tc = np.zeros((h_mbs * 4, w_mbs * 4), dtype=np.int64)
    ctxs: set = set()
    nals = []
    for si in range(n_slices):
        start, end = bounds[si], bounds[si + 1]
        bw = _BitWriter()
        bw.ue(start)  # first_mb_in_slice
        bw.ue(7)
        bw.ue(0)
        bw.u(4, 0)
        bw.ue(0)
        bw.u(1, 0)
        bw.u(1, 0)
        bw.se(0)
        bw.ue(deblock_idc)
        if deblock_idc != 1:
            bw.se(0)
            bw.se(0)
        for mb in range(start, end):
            mbx, mby = mb % w_mbs, mb // w_mbs
            x0, y0 = mbx * 16, mby * 16
            # neighbors must be in the SAME slice (6.4.8)
            left_ok = mbx > 0 and (mb - 1) >= start
            top_ok = mby > 0 and (mb - w_mbs) >= start
            bw.ue(0)  # mb_type I_NxN
            for idx in range(16):
                bw.u(1, 1)  # prev_intra4x4_pred_mode_flag: DC == MPM
            bw.ue(0)  # intra_chroma_pred_mode DC
            bw.ue(_CBP_INTRA_TO_CODE[15])  # all luma groups coded
            bw.se(0)  # mb_qp_delta
            for idx in range(16):
                bx, by = _z_luma(idx)
                x, y = x0 + 4 * bx, y0 + 4 * by
                pat = _TEXTURE_PATTERNS[
                    (seed * 31 + mb * 7 + idx * 3) % len(_TEXTURE_PATTERNS)
                ]
                scan = list(pat) + [0] * (16 - len(pat))
                nc = _nc_from_neighbors(
                    luma_tc, mbx * 4 + bx, mby * 4 + by, left_ok, top_ok
                )
                ctxs.add(
                    "flc" if nc >= 8 else
                    "ctx2" if nc >= 4 else
                    "ctx1" if nc >= 2 else "ctx0"
                )
                _encode_residual_block(bw, scan, nc, 16)
                luma_tc[mby * 4 + by, mbx * 4 + bx] = sum(
                    1 for c in scan if c
                )
                # reconstruction through the decoder's exact
                # arithmetic with slice-aware DC availability
                s_left = bx > 0 or left_ok
                s_top = by > 0 or top_ok
                pred = _pred_4x4(2, recon, x, y, s_left, s_top, False,
                                 False)
                d = _dequant_ac(_scan_to_block(scan), qp)
                r = (_inverse_core_4x4(d) + 32) >> 6
                recon[y : y + 4, x : x + 4] = np.clip(pred + r, 0, 255)
        bw.rbsp_trailing()
        nals.append(b"\x65" + rbsp_to_nal(bw.tobytes()))
    plane = recon.astype(np.uint8)
    if deblock_idc != 1:
        flat = np.full((h_mbs * 8, w_mbs * 8), 128, dtype=np.uint8)
        slice_map = np.zeros((h_mbs, w_mbs), dtype=np.int64)
        for si in range(n_slices):
            for mb in range(bounds[si], bounds[si + 1]):
                slice_map[mb // w_mbs, mb % w_mbs] = si
        params = [(deblock_idc, 0, 0)] * n_slices
        qpm = np.full((h_mbs, w_mbs), qp, dtype=np.int64)
        if n_slices == 1:
            plane, _, _ = _deblock_frame(
                plane, flat, flat.copy(), qpm, 0, 0, 0
            )
        else:
            plane, _, _ = _deblock_frame(
                plane, flat, flat.copy(), qpm, 0, 0, 0,
                slice_map=slice_map, slice_params=params,
            )
    return nals, plane[:height, :width], ctxs


def encode_p_frame(
    ref_planes: tuple,
    frame_num: int,
    seed: int,
    qp: int = 12,
    deblock: bool = False,
    weights: dict | None = None,
) -> tuple[bytes, tuple]:
    """One single-reference P slice NAL exercising every implemented
    inter shape: P_Skip runs, P_L0_16x16 (with and without CAVLC
    residual), P_L0_L0_16x8 and P_L0_L0_8x16 partitions with distinct
    motion vectors (integer, half- and quarter-pel), and an
    Intra_16x16 island (mb_type offset +5 inside P slices).  Motion
    vector differences are written against the decoder's own 8.4.1.3
    median prediction; reconstruction is tracked through the decoder's
    exact interpolation/residual/deblocking arithmetic. Returns
    (nal, next_ref_planes).

    ``ref_planes`` may be one plane triple (single reference) or a
    most-recent-first LIST of up to two (round 16: multi-reference —
    the slice then signals num_ref_idx_l0_active 2, every partition
    writes its te() ref_idx bit, and a dedicated mode predicts whole
    macroblocks from the two-frames-back picture).

    ``weights`` enables explicit weighted prediction (the PPS must
    set weighted_pred): {'luma_denom': d, 'chroma_denom': d2,
    'luma': [(w, o) | None per ref], 'cb': [...], 'cr': [...]}."""
    if isinstance(ref_planes, tuple):
        refs = [ref_planes]
    else:
        refs = list(ref_planes)
    nrefs = min(2, len(refs))
    refs_i64 = [
        tuple(p.astype(np.int64) for p in planes) for planes in refs
    ]
    h16, w16 = refs_i64[0][0].shape
    w_mbs, h_mbs = w16 // 16, h16 // 16
    bw = _BitWriter()
    bw.ue(0)                      # first_mb_in_slice
    bw.ue(0)                      # slice_type: P
    bw.ue(0)                      # pps_id
    bw.u(4, frame_num % 16)       # frame_num
    if nrefs > 1:
        bw.u(1, 1)                # num_ref_idx_active_override_flag
        bw.ue(nrefs - 1)          # num_ref_idx_l0_active_minus1
    else:
        bw.u(1, 0)
    bw.u(1, 0)                    # ref_pic_list_modification_flag_l0
    wp_luma = [None] * max(1, nrefs)
    wp_cb = [None] * max(1, nrefs)
    wp_cr = [None] * max(1, nrefs)
    luma_denom = chroma_denom = 0
    if weights is not None:       # pred_weight_table (7.3.3.2)
        luma_denom = int(weights.get("luma_denom", 0))
        chroma_denom = int(weights.get("chroma_denom", 0))
        wl = weights.get("luma", [None] * nrefs)
        wb = weights.get("cb", [None] * nrefs)
        wr = weights.get("cr", [None] * nrefs)
        bw.ue(luma_denom)
        bw.ue(chroma_denom)
        for i in range(nrefs):
            if wl[i] is not None:
                bw.u(1, 1)
                bw.se(wl[i][0])
                bw.se(wl[i][1])
                wp_luma[i] = wl[i]
            else:
                bw.u(1, 0)
            if wb[i] is not None:  # chroma flag covers Cb AND Cr
                bw.u(1, 1)
                bw.se(wb[i][0])
                bw.se(wb[i][1])
                bw.se(wr[i][0])
                bw.se(wr[i][1])
                wp_cb[i], wp_cr[i] = wb[i], wr[i]
            else:
                bw.u(1, 0)
    bw.u(1, 0)                    # adaptive_ref_pic_marking_mode_flag
    bw.se(0)                      # slice_qp_delta
    if deblock:
        bw.ue(0)
        bw.se(0)
        bw.se(0)
    else:
        bw.ue(1)

    def w_te(r):
        # te(v) ref_idx: absent for one ref, inverted bit for two
        if nrefs == 2:
            bw.u(1, 1 - r)

    y = np.zeros((h16, w16), dtype=np.int64)
    cb = np.zeros((h16 // 2, w16 // 2), dtype=np.int64)
    cr = np.zeros((h16 // 2, w16 // 2), dtype=np.int64)
    luma_tc = np.zeros((h_mbs * 4, w_mbs * 4), dtype=np.int64)
    ref4 = np.full((h_mbs * 4, w_mbs * 4), _REF_UNAVAIL, dtype=np.int64)
    mv4 = np.zeros((2, h_mbs * 4, w_mbs * 4), dtype=np.int64)
    qp_map = np.full((h_mbs, w_mbs), qp, dtype=np.int64)
    modes = [
        "skip", "mv16", "mv16r", "p16x8", "p8x16", "p8x8", "intra",
        "mv16ref1",
    ]
    skip_run = 0

    def mc_into(mbx, mby, parts):
        x0, y0 = mbx * 16, mby * 16
        pred = np.zeros((16, 16), dtype=np.int64)
        for gx_o, gy_o, pw4, ph4, mvx, mvy, ridx in parts:
            ry, rcb, rcr = refs_i64[ridx]
            pred[gy_o * 4 : (gy_o + ph4) * 4, gx_o * 4 : (gx_o + pw4) * 4] = (
                _apply_weight(
                    _interp_luma_block(
                        ry, x0 + gx_o * 4, y0 + gy_o * 4,
                        pw4 * 4, ph4 * 4, mvx, mvy,
                    ),
                    wp_luma[ridx], luma_denom,
                )
            )
            for refc, plane, wp_c in (
                (rcb, cb, wp_cb), (rcr, cr, wp_cr)
            ):
                plane[
                    mby * 8 + gy_o * 2 : mby * 8 + (gy_o + ph4) * 2,
                    mbx * 8 + gx_o * 2 : mbx * 8 + (gx_o + pw4) * 2,
                ] = np.clip(
                    _apply_weight(
                        _interp_chroma_block(
                            refc, mbx * 8 + gx_o * 2, mby * 8 + gy_o * 2,
                            pw4 * 2, ph4 * 2, mvx, mvy,
                        ),
                        wp_c[ridx], chroma_denom,
                    ),
                    0, 255,
                )
            gy, gx = mby * 4 + gy_o, mbx * 4 + gx_o
            ref4[gy : gy + ph4, gx : gx + pw4] = ridx
            mv4[0, gy : gy + ph4, gx : gx + pw4] = mvx
            mv4[1, gy : gy + ph4, gx : gx + pw4] = mvy
        return pred

    for mb in range(w_mbs * h_mbs):
        mbx, mby = mb % w_mbs, mb // w_mbs
        x0, y0 = mbx * 16, mby * 16
        mode = modes[(seed * 13 + frame_num * 5 + mb * 7) % len(modes)]
        if mode == "skip":
            mvx, mvy = _mv_skip(mv4, ref4, mbx * 4, mby * 4)
            pred = mc_into(mbx, mby, [(0, 0, 4, 4, mvx, mvy, 0)])
            y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred, 0, 255)
            luma_tc[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 0
            skip_run += 1
            continue
        bw.ue(skip_run)
        skip_run = 0
        if mode == "intra":
            # Intra_16x16 DC, cbp 0/0 (raw type 3) -> P mb_type 5 + 3
            pred = _pred_16x16(2, y, x0, y0, mbx > 0, mby > 0)
            target = (seed * 29 + frame_num * 53 + mb * 31) % 256
            lvl = _dc_level_for_residual(
                int(target) - int(pred[0, 0]), qp, nearest=True
            )
            bw.ue(5 + 3)
            bw.ue(0)      # intra_chroma_pred_mode DC -- chroma pred
            bw.se(0)      # mb_qp_delta
            scan = [0] * 16
            scan[0] = lvl
            nc = _nc_from_neighbors(
                luma_tc, mbx * 4, mby * 4, mbx > 0, mby > 0
            )
            _encode_residual_block(bw, scan, nc, 16)
            ls = 16 * _LS_V[qp % 6][0]
            qp6 = qp // 6
            if qp >= 36:
                dc = (lvl * ls) << (qp6 - 6)
            else:
                dc = (lvl * ls + (1 << (5 - qp6))) >> (6 - qp6)
            r = (dc + 32) >> 6 if lvl else 0
            y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred + r, 0, 255)
            # intra chroma DC prediction (chroma mode 0) from the
            # CURRENT frame
            for ci, plane in ((0, cb), (1, cr)):
                predc = _pred_chroma(
                    0, plane, mbx * 8, mby * 8, mbx > 0, mby > 0
                )
                plane[
                    mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8
                ] = np.clip(predc, 0, 255)
            ref4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = _REF_INTRA
            luma_tc[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 0
            luma_tc[mby * 4, mbx * 4] = 0  # DC plane carries the level
            continue
        # inter shapes: geometry + deterministic quarter-pel mvds;
        # each partition carries its reference index (te() coded when
        # the slice runs two reference frames)
        base = seed * 7 + frame_num * 11 + mb * 3
        subs = None
        if mode in ("mv16", "mv16r", "mv16ref1"):
            r0 = 1 if (mode == "mv16ref1" and nrefs == 2) else 0
            geo = [(0, 0, 4, 4, None, r0)]
            mvds = [((base % 13) - 6, ((base * 5) % 11) - 5)]
            p_type = 0
        elif mode == "p16x8":
            geo = [(0, 0, 4, 2, "top", 0), (0, 2, 4, 2, "bottom", 0)]
            mvds = [
                ((base % 9) - 4, ((base * 3) % 9) - 4),
                (((base * 7) % 9) - 4, ((base * 11) % 9) - 4),
            ]
            p_type = 1
        elif mode == "p8x16":
            geo = [(0, 0, 2, 4, "left", 0), (2, 0, 2, 4, "right", 0)]
            mvds = [
                ((base % 7) - 3, ((base * 3) % 7) - 3),
                (((base * 5) % 7) - 3, ((base * 9) % 7) - 3),
            ]
            p_type = 2
        else:  # p8x8: four sub_mb_types cycling all Table 7-17 shapes
            subs = [(base + i) % 4 for i in range(4)]
            refs_8x8 = [
                ((base + i) % nrefs if nrefs == 2 else 0)
                for i in range(4)
            ]
            geo = []
            for i8, s in enumerate(subs):
                ox, oy = (i8 % 2) * 2, (i8 // 2) * 2
                shapes = {
                    0: [(0, 0, 2, 2)],
                    1: [(0, 0, 2, 1), (0, 1, 2, 1)],
                    2: [(0, 0, 1, 2), (1, 0, 1, 2)],
                    3: [(0, 0, 1, 1), (1, 0, 1, 1),
                        (0, 1, 1, 1), (1, 1, 1, 1)],
                }[s]
                geo.extend(
                    (ox + sx, oy + sy, pw, ph, None, refs_8x8[i8])
                    for sx, sy, pw, ph in shapes
                )
            mvds = [
                (((base * (3 + i)) % 7) - 3, ((base * (5 + i)) % 5) - 2)
                for i in range(len(geo))
            ]
            p_type = 3
        bw.ue(p_type)
        if p_type == 3:
            for s in subs:
                bw.ue(s)
            for r8 in refs_8x8:  # ref_idx per 8x8 (7.3.5.2 order)
                w_te(r8)
        else:
            for g in geo:  # ref_idx per partition (7.3.5.1 order)
                w_te(g[5])
        for mdx, mdy in mvds:
            bw.se(mdx)
            bw.se(mdy)
        parts = []
        for (gx_o, gy_o, pw4, ph4, hint, ridx), (mdx, mdy) in zip(
            geo, mvds
        ):
            mvpx, mvpy = _mvp_median(
                mv4, ref4, mbx * 4 + gx_o, mby * 4 + gy_o, pw4, ph4,
                ref_idx=ridx, part_hint=hint,
            )
            mvx, mvy = mvpx + mdx, mvpy + mdy
            # register this partition's motion BEFORE predicting the
            # next one — the decoder's second partition sees it
            gy, gx = mby * 4 + gy_o, mbx * 4 + gx_o
            ref4[gy : gy + ph4, gx : gx + pw4] = ridx
            mv4[0, gy : gy + ph4, gx : gx + pw4] = mvx
            mv4[1, gy : gy + ph4, gx : gx + pw4] = mvy
            parts.append((gx_o, gy_o, pw4, ph4, mvx, mvy, ridx))
        pred = mc_into(mbx, mby, parts)
        if mode == "mv16r":
            cbp_luma = 15
            bw.ue(_CBP_INTER_TO_CODE[15])
            bw.se(0)  # mb_qp_delta
            for idx in range(16):
                bx2, by2 = _z_luma(idx)
                pat = _TEXTURE_PATTERNS[
                    (base + idx) % len(_TEXTURE_PATTERNS)
                ]
                scan = list(pat) + [0] * (16 - len(pat))
                nc = _nc_from_neighbors(
                    luma_tc, mbx * 4 + bx2, mby * 4 + by2, mbx > 0, mby > 0
                )
                _encode_residual_block(bw, scan, nc, 16)
                luma_tc[mby * 4 + by2, mbx * 4 + bx2] = sum(
                    1 for c in scan if c
                )
                d = _dequant_ac(_scan_to_block(scan), qp)
                r = (_inverse_core_4x4(d) + 32) >> 6
                pred[by2 * 4 : by2 * 4 + 4, bx2 * 4 : bx2 * 4 + 4] += r
        else:
            bw.ue(_CBP_INTER_TO_CODE[0])
            luma_tc[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 0
        y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred, 0, 255)
    if skip_run:
        bw.ue(skip_run)
    bw.rbsp_trailing()
    nal = b"\x41" + rbsp_to_nal(bw.tobytes())  # non-IDR slice, ref_idc 2
    if deblock:
        bs_v, bs_h = _deblock_bs_grids(ref4, luma_tc, mv4)
        y8, cb8, cr8 = _deblock_frame(
            y.astype(np.uint8), cb.astype(np.uint8), cr.astype(np.uint8),
            qp_map, 0, 0, 0, bs_v, bs_h,
        )
    else:
        y8, cb8, cr8 = (
            y.astype(np.uint8), cb.astype(np.uint8), cr.astype(np.uint8)
        )
    return nal, (y8, cb8, cr8)


def encode_ipp_stream(
    width: int,
    height: int,
    seed: int,
    n_frames: int,
    qp: int = 12,
    deblock: bool = False,
    num_refs: int = 1,
    weighted: bool = False,
) -> tuple[bytes, bytes, list[bytes], list[np.ndarray]]:
    """An IPPP... group: textured I frame then ``n_frames - 1`` P
    frames (encode_p_frame).  Returns (sps, pps, nal list, expected
    CROPPED luma plane per frame) — expectations tracked through the
    decoder's exact arithmetic, reference chain included.
    ``num_refs=2`` keeps a two-picture sliding window: P frames from
    the third on signal two active references, every partition writes
    its te() ref_idx, and some macroblocks predict from the
    two-frames-back picture.  ``weighted=True`` turns on explicit
    weighted prediction: each P frame carries a pred_weight_table
    with per-reference luma and chroma (weight, offset) pairs cycling
    identity and non-identity entries — the fade-handling path."""
    sps = _encode_sps(width, height, num_ref_frames=num_refs)
    pps = _encode_pps(qp, weighted=weighted)
    w_mbs, h_mbs = (width + 15) // 16, (height + 15) // 16
    i_nal, i_plane, _ = encode_textured_i4x4_idr(
        width, height, seed, qp, deblock=deblock
    )
    # rebuild the UNCROPPED reference the decoder keeps
    sps_d = parse_sps(nal_to_rbsp(sps[1:]))
    pps_d = parse_pps(nal_to_rbsp(pps[1:]))
    ref0 = decode_idr_planes(nal_to_rbsp(i_nal[1:]), sps_d, pps_d, 5, 3)
    refs = [ref0]
    nals, planes = [i_nal], [i_plane]
    for k in range(1, n_frames):
        wts = None
        if weighted:
            nr = min(2, len(refs))
            luma = [
                (70 + 10 * ((k + i) % 3), ((k * 3 + i) % 9) - 4)
                if (k + i) % 2 == 0 else None
                for i in range(nr)
            ]
            # chroma flag covers Cb AND Cr together
            cb_w = [
                (40 - (k + i) % 5, ((k + i) % 7) - 3)
                if (k + i) % 3 == 0 else None
                for i in range(nr)
            ]
            cr_w = [
                (28 + (k + i) % 5, 3 - ((k + i) % 7))
                if cb_w[i] is not None else None
                for i in range(nr)
            ]
            wts = {
                "luma_denom": 6, "chroma_denom": 5,
                "luma": luma, "cb": cb_w, "cr": cr_w,
            }
        nal, new_ref = encode_p_frame(
            refs, k, seed, qp, deblock=deblock, weights=wts
        )
        nals.append(nal)
        planes.append(new_ref[0][:height, :width].copy())
        refs = ([new_ref] + refs)[: max(1, num_refs)]
    return sps, pps, nals, planes


def encode_pattern_idr(
    w_mbs: int, h_mbs: int, block_vals: np.ndarray, qp: int = 12
) -> tuple[bytes, np.ndarray]:
    """One IDR NAL whose luma-DC blocks carry MULTIPLE nonzero CAVLC
    coefficients: ``block_vals`` gives a target gray PER 4x4 BLOCK
    ((h_mbs*4, w_mbs*4)); the encoder forward-Hadamards the per-block
    residuals and quantizes, so coeff_token rows beyond (0,0)/(1,1),
    total_zeros and run_before are all exercised. Quantization makes
    the result approximate — the EXACT expected luma plane (computed
    through the same spec arithmetic the decoder runs) is returned
    alongside the NAL for bit-exact assertions."""
    bw = _BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(4, 0)
    bw.ue(0)
    bw.u(1, 0)
    bw.u(1, 0)
    bw.se(0)
    bw.ue(1)
    qp6 = qp // 6
    ls = 16 * _LS_V[qp % 6][0]  # LevelScale with the x16 weightScale
    scale = 4 * (1 << (6 - qp6)) / ls if qp < 36 else 4 / (ls << (qp6 - 6))
    recon = np.zeros((h_mbs * 16, w_mbs * 16), dtype=np.int64)
    for mb in range(w_mbs * h_mbs):
        mbx, mby = mb % w_mbs, mb // w_mbs
        x0, y0 = mbx * 16, mby * 16
        pred = _pred_16x16(2, recon, x0, y0, mbx > 0, mby > 0)
        targets = block_vals[
            mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4
        ].astype(np.int64)
        residual = targets - int(pred[0, 0])
        levels = np.round(_hadamard4(residual) * scale).astype(np.int64)
        bw.ue(3)
        bw.ue(0)
        bw.se(0)
        _encode_residual_block(bw, _block_to_scan(levels), 0, 16)
        # exact decoder-side reconstruction for the expectation
        dc = _dequant_luma_dc(_hadamard4(levels), qp)
        r = (dc + 32) >> 6
        for by in range(4):
            for bx in range(4):
                recon[
                    y0 + by * 4 : y0 + by * 4 + 4,
                    x0 + bx * 4 : x0 + bx * 4 + 4,
                ] = np.clip(pred[by * 4, bx * 4] + r[by, bx], 0, 255)
    bw.rbsp_trailing()
    return b"\x65" + rbsp_to_nal(bw.tobytes()), recon.astype(np.uint8)


def encode_pcm_idr(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> bytes:
    """One IDR NAL of pure I_PCM macroblocks — arbitrary content,
    bit-exact by construction. Planes must be MB-aligned."""
    h, w = y.shape
    if h % 16 or w % 16:
        raise ValueError("I_PCM fixture planes must be MB-aligned")
    bw = _BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(4, 0)
    bw.ue(0)
    bw.u(1, 0)
    bw.u(1, 0)
    bw.se(0)
    bw.ue(1)
    for mby in range(h // 16):
        for mbx in range(w // 16):
            bw.ue(25)  # I_PCM
            while len(bw.bits) % 8:
                bw.u(1, 0)  # pcm_alignment_zero_bit
            blkY = y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
            blkU = cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
            blkV = cr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
            for v in blkY.reshape(-1):
                bw.u(8, int(v))
            for v in blkU.reshape(-1):
                bw.u(8, int(v))
            for v in blkV.reshape(-1):
                bw.u(8, int(v))
    bw.rbsp_trailing()
    return b"\x65" + rbsp_to_nal(bw.tobytes())


def encode_avc_stream(
    width: int, height: int, grays: list[int], qp: int = 12
) -> tuple[bytes, bytes, list[bytes]]:
    """(sps_nal, pps_nal, [idr_nal per frame]) for a solid-gray
    baseline-intra sequence."""
    sps = _encode_sps(width, height)
    pps = _encode_pps(qp)
    return sps, pps, [encode_gray_idr(width, height, g, qp) for g in grays]


def build_avcc(sps_nal: bytes, pps_nal: bytes) -> bytes:
    """AVCDecoderConfigurationRecord (ISO/IEC 14496-15), 4-byte NAL
    lengths."""
    return (
        bytes([1, sps_nal[1], sps_nal[2], sps_nal[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps_nal))
        + sps_nal
        + bytes([1])
        + struct.pack(">H", len(pps_nal))
        + pps_nal
    )
