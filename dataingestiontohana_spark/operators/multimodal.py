"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The container has no imaging/audio libraries, so the actual
codec step is STUBBED: `decode_media` parses this module's synthetic
deterministic media format (a fixed header + pseudo-pixel payload) and
raises `NotImplementedError` for real formats (JPEG/PNG/WAV/...). The
Spark-side plumbing — schema contracts, Arrow batch iteration, UDF
signatures, per-partition batching — is real and tested; swapping in
PIL/librosa later only changes the inner `_decode_payload` call.

Scale notes: media bytes never pass through Python row-at-a-time —
`mapInPandas` moves whole Arrow record batches; feature extraction
is numpy-vectorized per batch. Partitioning: media tables should be
stored with `maxRecordsPerFile`/row-group sizes tuned so one Arrow
batch of binaries fits executor memory (binary columns dominate).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# synthetic media container: magic, kind, width, height, n_frames
# (plain format string, not struct.Struct — Struct objects are not
# picklable and would break the mapInPandas closure)
_HEADER_FMT = ">4sBHHH"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)
_MAGIC = b"SGM1"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 1, 2, 3

MEDIA_SCHEMA = "media_id long, kind int, content binary"
DECODED_SCHEMA = (
    "media_id long, kind int, width int, height int, n_frames int, "
    "n_bytes int, mean_px double, std_px double"
)


def synth_media_bytes(media_id: int, kind: int, width: int, height: int,
                      n_frames: int = 1) -> bytes:
    """Deterministic fake media: header + sha256-expanded payload."""
    header = struct.pack(_HEADER_FMT, _MAGIC, kind, width, height, n_frames)
    need = width * height * n_frames
    out = bytearray()
    counter = 0
    seed = struct.pack(">qB", media_id, kind)
    while len(out) < need:
        out += hashlib.sha256(seed + struct.pack(">I", counter)).digest()
        counter += 1
    return header + bytes(out[:need])


def _decode_payload(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """The codec seam. Real formats are intentionally unimplemented."""
    if len(content) < _HEADER_SIZE or content[:4] != _MAGIC:
        raise NotImplementedError(
            "real media codecs (JPEG/PNG/WAV/MP4) are stubbed in this "
            "environment; only the SGM1 synthetic container is decodable"
        )
    _, kind, w, h, nf = struct.unpack(_HEADER_FMT, content[:_HEADER_SIZE])
    px = np.frombuffer(content, dtype=np.uint8, offset=_HEADER_SIZE)
    return w, h, nf, px


def decode_media(df: DataFrame) -> DataFrame:
    """binary media -> typed metadata + basic pixel statistics."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                w, h, nf, px = _decode_payload(bytes(content))
                rows.append(
                    (
                        mid,
                        kind,
                        w,
                        h,
                        nf,
                        len(content),
                        round(float(px.mean()), 4),
                        round(float(px.std()), 4),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "width",
                    "height",
                    "n_frames",
                    "n_bytes",
                    "mean_px",
                    "std_px",
                ],
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling: emit one row per kept frame (frame payload
    re-encoded as a single-frame image container). Row-expanding
    mapInPandas — the operator shape of a real decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != KIND_VIDEO:
                    continue
                w, h, nf, px = _decode_payload(bytes(content))
                frames = px.reshape(nf, h, w)
                for fi in range(0, nf, every_k):
                    payload = frames[fi].tobytes()
                    header = struct.pack(_HEADER_FMT, _MAGIC, KIND_IMAGE, w, h, 1)
                    out.append((mid, fi, header + payload))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(
        batches, schema="media_id long, frame_idx int, frame binary"
    )


def text_as_media(docs: DataFrame) -> DataFrame:
    """Wrap document text bytes as an opaque binary content column —
    the storage convention every multimodal operator consumes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )


def media_byte_features(docs: DataFrame) -> DataFrame:
    """Byte-level features over binary content via mapInPandas, with an
    exact SQL oracle (octet_length + md5) — proves the Arrow/pandas
    plumbing produces byte-identical results to the declarative path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(bytes(c)) for c in content],
                    "digest": [
                        hashlib.md5(bytes(c)).hexdigest() for c in content
                    ],
                }
            )

    return docs.mapInPandas(
        batches, schema="media_id long, n_bytes int, digest string"
    )
