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
