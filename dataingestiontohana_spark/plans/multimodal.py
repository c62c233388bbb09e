"""Declared multimodal queries: binary-column plumbing over the
documents table (text bytes as opaque content) with an exact oracle,
plus the decode/frame-sample pipeline on synthetic media (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.operators.multimodal import (
    KIND_AUDIO,
    KIND_IMAGE,
    KIND_VIDEO,
    audio_features,
    decode_media,
    media_byte_features,
    resize_images,
    sample_frames,
    synth_media_bytes,
    text_as_media,
)


def q36_media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas byte features with a DuckDB oracle: the Arrow/pandas
    path must be byte-identical to the declarative SQL computation."""
    d = load_table(spark, sf_dir, "documents")
    return (
        media_byte_features(text_as_media(d))
        .orderBy("media_id")
    )


# all four media parts (decode / frames / resize / audio) consume the
# same synthetic frame; building it four times re-runs the driver-side
# payload synthesis and re-ships it to the executors per part. One
# lazily-localCheckpointed frame per (application, n) is shared
# instead, mirroring llm_dedup's edge-set cache.
_MEDIA_CACHE: dict[tuple[str, int], DataFrame] = {}


def _synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    key = (spark.sparkContext.applicationId, n)
    df = _MEDIA_CACHE.get(key)
    if df is not None:
        return df
    # bound the cache: entries for stopped sessions are unreachable but
    # would otherwise accumulate across session restarts in one process
    # (pytest, repeated bench runs) — latest application only
    for k in [k for k in _MEDIA_CACHE if k[0] != key[0]]:
        _MEDIA_CACHE.pop(k, None)
    rows = []
    for i in range(n):
        kind = (
            KIND_VIDEO if i % 4 == 0
            else KIND_AUDIO if i % 4 == 1
            else KIND_IMAGE
        )
        nf = 6 if kind == KIND_VIDEO else 1
        w, h = (256, 1) if kind == KIND_AUDIO else (32, 16)
        rows.append((i, kind, synth_media_bytes(i, kind, w, h, nf)))
    df = spark.createDataFrame(
        rows, "media_id long, kind int, content binary"
    ).localCheckpoint(eager=False)
    _MEDIA_CACHE[key] = df
    return df


def q37_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pipeline on deterministic synthetic media (rows-only:
    binary codecs aren't expressible in SQL)."""
    return decode_media(_synthetic_media(spark)).orderBy("media_id")


def q38_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 2nd frame): the row-expanding
    mapInPandas shape, aggregated per video (rows-only)."""
    frames = sample_frames(_synthetic_media(spark), every_k=2)
    return (
        frames.groupBy("media_id")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("media_id")
    )


def q37b_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail normalization: every decodable image nearest-neighbor
    resized to 8x8, audited by output byte length (rows-only)."""
    resized = resize_images(_synthetic_media(spark), out_w=8, out_h=8)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.length("content").cast("int").alias("n_bytes"),
    ).orderBy("media_id")


def q38b_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio spectral fingerprint: RMS + first rFFT band energies per
    audio payload (rows-only)."""
    feats = audio_features(_synthetic_media(spark), n_bands=8)
    return feats.select(
        "media_id",
        "n_samples",
        "rms",
        F.col("bands")[0].alias("b0"),
        F.col("bands")[1].alias("b1"),
        F.col("bands")[2].alias("b2"),
        F.col("bands")[3].alias("b3"),
    ).orderBy("media_id")


QUERIES = {
    "q36_media_byte_features": q36_media_byte_features,
    "q37_media_decode": q37_media_decode,
    "q38_frame_sample": q38_frame_sample,
    "q37b_media_resize": q37b_media_resize,
    "q38b_audio_features": q38b_audio_features,
}

ORACLES = {
    "q36_media_byte_features": """
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               md5(text) AS digest
        FROM documents ORDER BY media_id
    """,
}
