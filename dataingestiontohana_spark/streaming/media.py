"""Streaming media ingest: a directory of image/audio files flows
through the SAME `decode_media` operator the batch pipeline uses —
metadata + exact pixel moments out, corrupt payloads routed to the
quarantine column instead of killing the stream (the reference's
malformed-CSV dead-letter discipline, `README.md:8-13`, applied to
binary media in motion).

Scale shape: the file source lists incrementally and
`maxFilesPerTrigger` bounds each micro-batch; the decode itself is
the map-only Arrow `mapInPandas` of `operators/multimodal.py` — no
shuffle, no state, so the stream's only state is the file-source log
(checkpointed; restart-safe like every other source here). On a
cluster the same query reads object-store prefixes; nothing below is
local-fs specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.operators.multimodal import (
    KIND_AUDIO,
    KIND_IMAGE,
    KIND_VIDEO,
    decode_media,
)

def _kind_by_ext() -> F.Column:
    """extension -> media kind; the decoder dispatches on MAGIC
    anyway, so this column only drives kind-gated downstream
    operators (r12: .avi and .mov route KIND_VIDEO so frame sampling
    sees streamed clips). (A function, not a module constant: building
    a Column needs an active session, and this module imports
    session-free.)"""
    return (
        F.when(F.col("path").rlike(r"(?i)\.(wav)$"), F.lit(KIND_AUDIO))
        .when(
            F.col("path").rlike(r"(?i)\.(avi|mov)$"), F.lit(KIND_VIDEO)
        )
        .otherwise(F.lit(KIND_IMAGE))
    )


def media_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """readStream over a media drop directory -> the (media_id, kind,
    content) contract every multimodal operator consumes, plus the
    IDENTITY columns.

    ``media_key`` (md5 hex of the full path, 128-bit) is the identity
    keyed sinks must key on: deterministic across restarts (replayed
    files absorb idempotently) and collision-free in practice.
    ``media_id`` (abs(xxhash64) of the path) is a DISPLAY/join-locality
    column only — 63 effective bits means ~5% birthday collision odds
    at 10^9 files, and a collision in a keyed sink would silently
    merge two files' rows. ``src_path`` carries the raw path for
    human audit."""
    files = (
        spark.readStream.format("binaryFile")
        # streaming file sources require an explicit schema; this is
        # the binaryFile source's fixed one
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.*")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )
    return files.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        _kind_by_ext().alias("kind"),
        "content",
        F.md5(F.col("path")).alias("media_key"),
        F.col("path").alias("src_path"),
    )


def decoded_media_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """The full streaming decode: file stream -> `decode_media`
    (quarantine-aware) with media_key + src_path carried through on
    every row — the keyed-sink identity and the dead-letter audit
    trail. One map-only stage; the stream never dies on a corrupt OR
    unsupported blob: `quarantine_unsupported=True` routes
    NotImplementedError (a stray .mp4/.txt/temp file the *.* glob
    admits) to the decode_error column too — in streaming, a raised
    decode error is not a capability boundary but a poison pill,
    because the file-source checkpoint replays the same batch forever
    on restart."""
    src = media_file_stream(spark, path, max_files_per_trigger)
    # identity + audit columns ride the 1:1 decode as passthroughs,
    # so a quarantine row names its dead file directly — no join, the
    # stream stays single-stage map-only
    return decode_media(
        src,
        passthrough=("media_key", "src_path"),
        quarantine_unsupported=True,
    )


def run_media_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    collected: list,
    max_files_per_trigger: int = 16,
):
    """Drive the decode stream into a driver-side list via
    foreachBatch (test/demo sink; swap for a parquet/JDBC sink in
    production — the frame is an ordinary micro-batch DataFrame).
    Returns the StreamingQuery."""
    stream = decoded_media_stream(spark, source_dir, max_files_per_trigger)

    def sink(bdf: DataFrame, _epoch: int) -> None:
        collected.extend(bdf.collect())

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def warc_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """readStream over a crawl-archive drop directory -> one row per
    WARC record (r9). Same restart discipline as the media stream:
    the file-source log checkpoints which archives were processed, the
    parse is map-only (`sources/warc.py::warc_records` — two-level
    dead-letter, so a malformed record or file can never wedge the
    checkpoint). Keyed-sink identity = (file_key, rec_idx): file_key
    is the md5 hex of the archive path (the media_key discipline) and
    rides the 1:N parse as a passthrough column together with
    src_path, so quarantine rows name their dead archive directly."""
    from dataingestiontohana_spark.sources.warc import warc_records

    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
        .select(
            F.abs(F.xxhash64("path")).alias("file_id"),
            "content",
            F.md5(F.col("path")).alias("file_key"),
            F.col("path").alias("src_path"),
        )
    )
    return warc_records(files, passthrough=("file_key", "src_path"))
