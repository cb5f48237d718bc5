"""Multimodal (binary) column plumbing: decode / feature-extract stubs.

North-star extension (BASELINE.json): image/audio/video are opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` — the pattern generalizes the reference's
``image``/``files`` metadata columns (/root/reference/app/db/
postgres.py:144-145). The real codecs (PIL/librosa/av) are NOT in this
container, so the decode step is stubbed with a deterministic fake; the
Spark-side plumbing — schema, Arrow batch shape, UDF signature,
partition-parallel execution — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "doc_id bigint, byte_len int, width int, height int, n_frames int"


def real_image_decode(content: bytes) -> dict:
    """Placeholder for the real decoder (PIL.Image.open(io.BytesIO(...))).

    Image libraries are not available in this environment; see
    `fake_decode_features` for the deterministic stand-in exercised by
    tests and oracles.
    """
    raise NotImplementedError("image codecs not available in this environment")


def fake_decode_features(doc_id: int, content: bytes) -> tuple[int, int, int, int]:
    """Deterministic fake decode: features derived from the byte stream
    only, so the DuckDB oracle can mirror them from octet_length."""
    n = len(content)
    return n, n % 640, (n * 7) % 480, doc_id % 5 + 1


def decode_stub_features(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "content"
) -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Arrow-batched: each pandas batch holds `binary_col` as bytes
    objects; the UDF is embarrassingly parallel across partitions, so
    at 100 TB throughput scales with executors (repartition upstream to
    balance batch sizes for heavy codecs).
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("content"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_decode_features(int(i), bytes(c))
                for i, c in zip(pdf["doc_id"], pdf["content"])
            ]
            out = pd.DataFrame(
                feats, columns=["byte_len", "width", "height", "n_frames"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return src.mapInPandas(extract, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, orig_len int, thumb_len int, thumb_head_hex string"


def resize_stub(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "content", stride: int = 4
) -> DataFrame:
    """'Resize' a binary column: deterministic fake downsample (every
    ``stride``-th byte — real path: PIL thumbnail). The UDF both
    produces the new binary AND reports its metadata; only metadata +
    a head-bytes hex leave the operator so the oracle can mirror it
    byte-for-byte from the source blob."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("content"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, olens, tlens, heads = [], [], [], []
            for i, c in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(c)
                thumb = b[::stride]
                ids.append(int(i))
                olens.append(len(b))
                tlens.append(len(thumb))
                heads.append(thumb[:4].hex())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "orig_len": olens,
                    "thumb_len": tlens,
                    "thumb_head_hex": heads,
                }
            )

    return src.mapInPandas(resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int, frame_len int"


def frame_sample_stub(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "content"
) -> DataFrame:
    """Frame sampling over a binary (video-like) column: one output row
    per sampled frame — the variable-rows-per-input ``mapInPandas``
    shape a real codec UDF needs (a batch of N inputs yields ΣnFrames
    rows). Frame count/offsets are the deterministic fake (real path:
    av/ffmpeg seek table); the batch plumbing is real."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("content"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens = [], [], [], []
            for i, c in zip(pdf["doc_id"], pdf["content"]):
                n = len(bytes(c))
                n_frames = int(i) % 5 + 1
                flen = n // n_frames
                for k in range(n_frames):
                    ids.append(int(i))
                    idxs.append(k)
                    offs.append(k * flen)
                    lens.append(flen)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_offset": offs, "frame_len": lens}
            )

    return src.mapInPandas(sample, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# BMP: one REAL codec (pure Python, no deps) behind the same plumbing
# ---------------------------------------------------------------------------

import struct

BMP_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, bpp int, "
    "channels int, mean_r double, mean_g double, mean_b double"
)


def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal spec-compliant 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, rows padded to 4 bytes) filled with a solid color.
    Public format, written from the spec — no image library involved."""
    r, g, b = rgb
    row = bytes([b, g, r]) * width
    pad = (4 - (width * 3) % 4) % 4
    raster = (row + b"\x00" * pad) * height
    size = 14 + 40 + len(raster)
    file_header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_header + info_header + raster


def decode_bmp(content: bytes) -> dict:
    """Real BMP decode: parse both headers, then walk the raster
    (bottom-up rows, per-row padding) to per-channel means. Supports
    the uncompressed 24-bit BITMAPINFOHEADER profile; anything else
    raises ValueError (honest partial support, not a silent guess)."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    header_size, width, height = struct.unpack_from("<Iii", content, 14)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if header_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP profile (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"degenerate BMP dimensions ({width}x{height})")
    row_stride = (width * 3 + 3) & ~3
    tot = [0, 0, 0]  # b, g, r accumulation
    for y in range(height):
        base = data_offset + y * row_stride
        row = content[base : base + width * 3]
        if len(row) < width * 3:
            raise ValueError("truncated raster")
        tot[0] += sum(row[0::3])
        tot[1] += sum(row[1::3])
        tot[2] += sum(row[2::3])
    n_px = width * height
    return {
        "byte_len": len(content),
        "width": width,
        "height": height,
        "bpp": bpp,
        "channels": 3,
        "mean_r": tot[2] / n_px,
        "mean_g": tot[1] / n_px,
        "mean_b": tot[0] / n_px,
        "top_down": top_down,
    }


def decode_bmp_features(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "content"
) -> DataFrame:
    """mapInPandas over a binary column with the REAL BMP decoder —
    identical batch plumbing to decode_stub_features, but the bytes are
    actually parsed (headers, padding, raster walk)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("content"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, c in zip(pdf["doc_id"], pdf["content"]):
                d = decode_bmp(bytes(c))
                rows.append(
                    (
                        int(i),
                        d["byte_len"],
                        d["width"],
                        d["height"],
                        d["bpp"],
                        d["channels"],
                        d["mean_r"],
                        d["mean_g"],
                        d["mean_b"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "byte_len",
                    "width",
                    "height",
                    "bpp",
                    "channels",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                ],
            )

    return src.mapInPandas(extract, schema=BMP_SCHEMA)


def synthetic_bmp_frame(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Real encoded bytes for the BMP path: render one solid-color BMP
    per input row, dimensions/color derived from the id (widths 1..21
    exercise every row-padding case). The test fixtures are read-only,
    so the encoded fixture rides in-flight — the bytes are REAL BMP
    streams produced by :func:`encode_bmp`, and the paired oracle
    predicts header/raster values from the same id arithmetic."""
    src = df.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_bmp(
                    int(i) % 21 + 1,
                    int(i) % 13 + 1,
                    ((int(i) * 3) % 256, (int(i) * 5) % 256, (int(i) * 7) % 256),
                )
                for i in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "content": content})

    return src.mapInPandas(gen, schema="doc_id bigint, content binary")
