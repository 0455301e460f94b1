"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is a ``binary``
column (or a pointer to object storage); metadata (size, content hash,
decoded dimensions) is computed once at ingest and carried as plain
columns so downstream filters prune without touching bytes.

The real decoders (PIL/ffmpeg/torchaudio) are not in this container, so
``decode_image`` raises ``NotImplementedError`` by design and
``fake_decode_features`` provides a deterministic stand-in that exercises
the full Spark plumbing — Arrow batches through ``mapInPandas``, binary
in, fixed-schema features out — which is the part that must be right at
scale (batch sizes, schema, partition mapping).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("doc_id bigint, n_bytes int, mean_byte double, "
                 "max_byte int, width int, height int")


def binary_payload(text: Column) -> Column:
    """Stand-in payload: utf-8 bytes of the text column. With real data
    this is the image/audio bytes read by ``spark.read.format('binaryFile')``."""
    return F.encode(text, "utf-8")


def payload_metadata(df: DataFrame, id_col: str, payload: Column) -> DataFrame:
    """Ingest-time metadata projection: byte length, sha256, synthetic
    width/height derived from a content hash (deterministic; replaced by
    decoder output when real decoders exist)."""
    h = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
        (h % 448 + 64).cast("int").alias("width"),
        (F.conv(F.substring(F.md5(payload), 16, 15), 16, 10).cast("long") % 448 + 64)
            .cast("int").alias("height"),
    )


def decode_image(payload: bytes) -> object:
    """Real image decode — requires PIL/libvips, not present in this
    container. The Spark-side plumbing around it (fake_decode_features)
    is real and tested."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips which are not installed; "
        "use fake_decode_features for plumbing tests")


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize — requires PIL/libvips, not present in this
    container. The Spark-side plumbing (fake_resize) is real and tested."""
    raise NotImplementedError(
        "image resizing requires PIL/libvips which are not installed; "
        "use fake_resize for plumbing tests")


def fake_resize(df: DataFrame, width: int, height: int,
                id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """Arrow-batched 'resize': binary in → fixed-size binary out via
    ``mapInPandas`` — the exact shape a real resampler plugs into (swap
    the tile/truncate line for PIL). The fake output is the source bytes
    tiled/truncated to a width×height 'pixel buffer', so tests can assert
    byte-exact results and output size is schema-predictable — the
    property that matters at scale, where the sink partitions by
    (rows × width × height) bytes."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = width * height
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) or b"\x00"
                out = (b * (size // len(b) + 1))[:size]
                rows.append({"doc_id": doc_id, "width": width,
                             "height": height, "payload": out})
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                              "payload"])

    return df.mapInPandas(
        resize, schema="doc_id bigint, width int, height int, payload binary")


def sample_frames(df: DataFrame, every_n: int = 4, frame_bytes: int = 64,
                  id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame sampling: one output row per kept frame — the row-expanding
    ``mapInPandas`` shape (batch in, variable rows out) that a real
    ffmpeg keyframe extractor plugs into. The fake treats the payload as
    a stream of ``frame_bytes``-sized frames and keeps every
    ``every_n``-th, emitting (doc_id, frame_idx, frame). Output rows per
    input row = ceil(n_frames / every_n), so at 100 TB the expansion
    factor — and thus output partition sizing — is known up front."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = max(1, (len(b) + frame_bytes - 1) // frame_bytes)
                for idx in range(0, n_frames, every_n):
                    rows.append({"doc_id": doc_id, "frame_idx": idx,
                                 "frame": b[idx * frame_bytes:
                                            (idx + 1) * frame_bytes]})
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.mapInPandas(
        sample, schema="doc_id bigint, frame_idx int, frame binary")


def fake_decode_features(df: DataFrame, id_col: str = "doc_id",
                         payload_col: str = "payload") -> DataFrame:
    """Arrow-batched 'decode': per-payload byte statistics + synthetic
    dimensions via ``mapInPandas``. Deterministic, so tests can assert
    exact values; swaps to a real decoder by replacing the inner loop."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n = len(b)
                rows.append({
                    "doc_id": doc_id,
                    "n_bytes": n,
                    "mean_byte": (sum(b) / n) if n else 0.0,
                    "max_byte": max(b) if n else 0,
                    "width": int.from_bytes(b[:4], "big", signed=False) % 448 + 64 if n >= 4 else 64,
                    "height": int.from_bytes(b[4:8], "big", signed=False) % 448 + 64 if n >= 8 else 64,
                })
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "mean_byte",
                                              "max_byte", "width", "height"])

    return df.mapInPandas(decode, schema=DECODE_SCHEMA)
