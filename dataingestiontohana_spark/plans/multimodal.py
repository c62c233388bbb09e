"""Declared multimodal queries: binary-column plumbing over the
documents table (text bytes as opaque content) with an exact oracle,
plus the decode / frame-sample / resize / audio pipeline on synthetic
media — fully value-oracle-backed since round 5.

Oracle strategy (the q39 md5-grid maneuver applied to media): the
synthetic SGM1 payload bytes are md5-expanded from an ASCII seed
(`operators/multimodal.py:synth_media_bytes`), so DuckDB recomputes
every byte with `md5()` + hex-digit arithmetic. The driver-adjudicated
parts emit EXACT INTEGER byte moments (px_sum, px_sqsum, per-frame
checksums) instead of floats: the integer moments determine mean/std/
rms exactly (mean = sum/n, var = sqsum/n - mean^2), so the check is
strictly stronger than comparing rounded floats — and immune to
cross-engine float formatting. Float outputs (mean_px, std_px, rms,
FFT bands) stay on the operators and are numpy-pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import (
    load_table,
    local_rows,
    locked_frame_builder,
)
from dataingestiontohana_spark.operators.multimodal import (
    _IMA_STEP_TABLE,
    KIND_AUDIO,
    KIND_IMAGE,
    KIND_VIDEO,
    audio_features,
    decode_media,
    media_byte_features,
    resize_images,
    sample_frames,
    synth_media_bytes,
    avi_audio_samples,
    video_dhash,
    video_neardup_pairs,
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


def _local_rows(spark: SparkSession, rows: list, slices: int) -> DataFrame:
    """Driver-built media corpus -> DataFrame with ``slices``
    partitions; see catalog.local_rows for why this is NOT
    ``spark.createDataFrame(rows).coalesce(k)`` (measured 7.6 s -> 0.2 s
    to materialize a 4-row corpus at local[32])."""
    return local_rows(
        spark, rows, "media_id long, kind int, content binary", slices
    )


@locked_frame_builder
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
    # 64 items x ~3 KB: spread over defaultParallelism(32) partitions,
    # EVERY downstream mapInPandas pays 32 python-worker invocations
    # for ~2 rows each — and the bundle chains five such operators.
    # Coalesce the fixture to 4 partitions (measured: bundle 23 s -> ~3 s
    # cold at sf0.001). Real media tables read from parquet with
    # size-based partitioning; this is fixture plumbing, not the
    # operator's scale shape.
    df = (
        _local_rows(spark, rows, 4)
        .localCheckpoint(eager=False)
    )
    _MEDIA_CACHE[key] = df
    return df


def q37_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pipeline on deterministic synthetic media. The driver
    surface is the exact-integer byte moments (px_sum, px_sqsum) plus
    metadata; these determine the operator's mean/std floats exactly."""
    return (
        decode_media(_synthetic_media(spark))
        .select(
            "media_id", "kind", "width", "height", "n_frames",
            "n_bytes", "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


def q38_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 2nd frame): the row-expanding
    mapInPandas shape, with each kept frame pinned to its exact
    byte-sum checksum (verifies the SLICE, not just the count)."""
    frames = sample_frames(_synthetic_media(spark), every_k=2)
    return frames.select("media_id", "frame_idx", "frame_px_sum").orderBy(
        "media_id", "frame_idx"
    )


def q37b_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail normalization: every image nearest-neighbor resized to
    8x8, then RE-DECODED — the re-encode/decode round trip audited by
    the exact byte moments of the 64 gathered pixels."""
    from dataingestiontohana_spark.operators.multimodal import KIND_IMAGE as _KI

    resized = resize_images(_synthetic_media(spark), out_w=8, out_h=8)
    decoded = decode_media(
        resized.select("media_id", F.lit(_KI).alias("kind"), "content")
    )
    return decoded.select(
        "media_id", "width", "height", "n_bytes", "px_sum", "px_sqsum"
    ).orderBy("media_id")


def _probe_media(spark: SparkSession) -> DataFrame:
    """Perturbed copies of the synthetic images (media_id + 1000):
    payload bytes at positions divisible by 37 get +8 mod 256 — a
    small 'brightness splash' on ~3% of pixels, the planted near-dup
    set for perceptual-hash detection. Deterministic, so the oracle
    rebuilds the identical probes."""
    import struct as _s

    from dataingestiontohana_spark.operators.multimodal import (
        _HEADER_FMT,
        _MAGIC,
    )

    rows = []
    for i in range(64):
        if i % 4 in (0, 1):  # images only
            continue
        full = synth_media_bytes(i, KIND_IMAGE, 32, 16)
        payload = bytearray(full[11:])
        for p in range(0, len(payload), 37):
            payload[p] = (payload[p] + 8) % 256
        header = _s.pack(_HEADER_FMT, _MAGIC, KIND_IMAGE, 32, 16, 1)
        rows.append((i + 1000, KIND_IMAGE, header + bytes(payload)))
    return _local_rows(spark, rows, 2)


# like _MEDIA_CACHE: q81 emits the hashes, q82 pairs them, and q82's
# band self-join reads the frame twice — one lazy checkpoint instead
# of re-running the dhash mapInPandas up to 4x per bundle action
_DHASH_CACHE: dict[str, DataFrame] = {}


@locked_frame_builder
def _dhash_frame(spark: SparkSession) -> DataFrame:
    from dataingestiontohana_spark.operators.multimodal import dhash_images

    key = spark.sparkContext.applicationId
    df = _DHASH_CACHE.get(key)
    if df is not None:
        return df
    _DHASH_CACHE.clear()
    both = _synthetic_media(spark).where(F.col("kind") == KIND_IMAGE).unionByName(
        _probe_media(spark)
    )
    df = dhash_images(both).localCheckpoint(eager=False)
    _DHASH_CACHE[key] = df
    return df


def q81_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash fingerprints for the 32 synthetic images plus
    their 32 perturbed probes — each 64-bit hash value-checked bit-for-
    bit by the integer oracle."""
    return _dhash_frame(spark).orderBy("media_id")


def q82_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs: banded-LSH candidates over the
    dHashes + exact Hamming verify — the image-space member of the
    dedup family, detecting each probe against its original."""
    from dataingestiontohana_spark.operators.multimodal import (
        dhash_neardup_pairs,
    )

    return dhash_neardup_pairs(_dhash_frame(spark), max_hamming=10).orderBy(
        "id_a", "id_b"
    )


def _audio_probe_media(spark: SparkSession) -> DataFrame:
    """Perturbed copies of the synthetic audio clips (media_id +
    2000): sample bytes at positions divisible by 29 get +4 mod 256 —
    level-preserving click noise on ~3% of samples, the planted
    near-dup set for the audio fingerprint. Deterministic, so the
    oracle rebuilds the identical probes."""
    import struct as _s

    from dataingestiontohana_spark.operators.multimodal import (
        _HEADER_FMT,
        _MAGIC,
    )

    rows = []
    for i in range(64):
        if i % 4 != 1:  # audio only
            continue
        full = synth_media_bytes(i, KIND_AUDIO, 256, 1)
        payload = bytearray(full[11:])
        for p in range(0, len(payload), 29):
            payload[p] = (payload[p] + 4) % 256
        header = _s.pack(_HEADER_FMT, _MAGIC, KIND_AUDIO, 256, 1, 1)
        rows.append((i + 2000, KIND_AUDIO, header + bytes(payload)))
    return _local_rows(spark, rows, 2)


_AHASH_CACHE: dict[str, DataFrame] = {}


@locked_frame_builder
def _ahash_frame(spark: SparkSession) -> DataFrame:
    from dataingestiontohana_spark.operators.multimodal import (
        energy_hash_audio,
    )

    key = spark.sparkContext.applicationId
    df = _AHASH_CACHE.get(key)
    if df is not None:
        return df
    _AHASH_CACHE.clear()
    both = _synthetic_media(spark).where(
        F.col("kind") == KIND_AUDIO
    ).unionByName(_audio_probe_media(spark))
    df = energy_hash_audio(both, n_blocks=32).localCheckpoint(eager=False)
    _AHASH_CACHE[key] = df
    return df


def q209_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio energy-envelope fingerprints (the audio member of the
    perceptual-hash family, `operators/multimodal.py::
    energy_hash_audio`): 16 synthetic clips + 16 click-noise probes,
    each 32-bit hash value-checked bit-for-bit by the integer oracle
    (block energies are exact sums of squared samples)."""
    return _ahash_frame(spark).orderBy("media_id")


def q210_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs: banded-LSH candidates over the
    energy fingerprints + exact Hamming verify — same shape as image
    q82 / text MinHash; detects each click-noise probe against its
    original clip."""
    from dataingestiontohana_spark.operators.multimodal import (
        dhash_neardup_pairs,
    )

    return dhash_neardup_pairs(
        _ahash_frame(spark),
        max_hamming=8,
        n_bands=4,
        hash_bits=32,
        hash_col="ahash",
    ).orderBy("id_a", "id_b")


# Color-PNG corpus: 36 REAL PNG files (12 RGB, 12 RGBA, 12 palette),
# 16x8 px, pixel bytes md5-expanded from "{media_id}:png:{chunk}" and
# encoded through the pure-stdlib encoder with a per-row filter mix
# (0,1,2,3,4) — so decoding exercises EVERY unfilter branch on every
# image. The zlib encode/decode round trip cancels in the oracle: the
# adjudicated moments are over decoded channel bytes, which DuckDB
# recomputes from the md5 expansion (palette entries are closed-form:
# entry k = ((k*37)%256, (k*59)%256, (k*83)%256), index = byte % 64).
_PNG_CACHE: dict[str, DataFrame] = {}
_PNG_W, _PNG_H = 16, 8


@locked_frame_builder
def _png_color_corpus(spark: SparkSession) -> DataFrame:
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import encode_png

    key = spark.sparkContext.applicationId
    df = _PNG_CACHE.get(key)
    if df is not None:
        return df
    _PNG_CACHE.clear()

    def md5_expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:png:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    pal = np.array(
        [[(k * 37) % 256, (k * 59) % 256, (k * 83) % 256] for k in range(64)],
        dtype=np.uint8,
    )
    filters = (0, 1, 2, 3, 4)
    rows = []
    for i in range(36):
        ct = (2, 6, 3)[i % 3]
        # every other image ships Adam7-INTERLACED (round 7): the
        # decoded pixels are identical — interlace is a lossless
        # container rearrangement — so the md5-expansion oracle
        # adjudicates the interlaced decode path with NO SQL change
        il = i % 2
        if ct == 3:
            raw = md5_expand(i, _PNG_W * _PNG_H)
            idx = (np.frombuffer(raw, np.uint8) % 64).reshape(_PNG_H, _PNG_W)
            png = encode_png(idx, 3, filters, palette=pal, interlace=il)
        else:
            ch = 3 if ct == 2 else 4
            raw = md5_expand(i, _PNG_W * _PNG_H * ch)
            arr = np.frombuffer(raw, np.uint8).reshape(_PNG_H, _PNG_W, ch)
            png = encode_png(arr, ct, filters, interlace=il)
        rows.append((i, KIND_IMAGE, png))
    # tRNS rows 36-41 (r9): the three transparency forms the spec
    # defines — per-entry palette alphas, a grayscale sample key, an
    # RGB sample key — plain (36-38) and Adam7 (39-41). Keys are the
    # image's OWN first expansion byte, so at least one pixel always
    # matches and the alpha rule is exercised for real; the RGB image
    # plants r=g=b so the oracle's alpha stays a per-byte formula (the
    # all-three-channels-must-match semantics are pinned in pytest).
    for i in range(36, 42):
        form = i % 3  # 0 palette, 1 gray key, 2 rgb key
        il = 1 if i >= 39 else 0
        raw = md5_expand(i, _PNG_W * _PNG_H)
        if form == 0:
            idx = (np.frombuffer(raw, np.uint8) % 64).reshape(_PNG_H, _PNG_W)
            alphas = bytes(((k * 29) % 256) for k in range(64))
            png = encode_png(
                idx, 3, filters, palette=pal, interlace=il, trns=alphas
            )
        elif form == 1:
            g = np.frombuffer(raw, np.uint8).reshape(_PNG_H, _PNG_W)
            png = encode_png(g, 0, filters, interlace=il, trns=int(raw[0]))
        else:
            b = np.frombuffer(raw, np.uint8)
            arr = np.repeat(b, 3).reshape(_PNG_H, _PNG_W, 3)
            png = encode_png(
                arr, 2, filters, interlace=il,
                trns=(int(raw[0]),) * 3,
            )
        rows.append((i, KIND_IMAGE, png))
    df = (
        _local_rows(spark, rows, 2)
        .localCheckpoint(eager=False)
    )
    _PNG_CACHE[key] = df
    return df


def q88_png_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real color-PNG decode: RGB, RGBA, and palette images (with a
    full per-row filter mix) flow through the production `decode_media`
    operator; the adjudicated columns are the exact integer moments of
    the decoded channel bytes — a bitwise proof of the zlib + unfilter
    + palette-expansion path (cites `README.md`'s image-rich pipeline
    surface; codec parity per `operators/multimodal.py::_parse_png`)."""
    return (
        decode_media(_png_color_corpus(spark))
        .select(
            "media_id", "width", "height", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


_JPEG_CACHE: dict[str, DataFrame] = {}
_JPEG_BW, _JPEG_BH = 3, 2  # mosaic of 3x2 constant 8x8 blocks (24x16 px)


@locked_frame_builder
def _jpeg_mosaic_corpus(spark: SparkSession) -> DataFrame:
    """REAL JPEG streams whose decode is EXACT: each image is a mosaic
    of constant 8x8 blocks (block j = byte j of md5('{id}:jpg:0')) at
    unit quantization — a constant block's DCT is DC-only and integer,
    so dequant + IDCT reproduce every pixel bit-exactly and a SQL
    oracle can recompute the moments from the md5 seed. Even ids
    encode BASELINE (every fourth with restart intervals), odd ids
    PROGRESSIVE (the full multi-scan successive-approximation script)
    — both real decode paths under the same value gate."""
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    key = spark.sparkContext.applicationId
    df = _JPEG_CACHE.get(key)
    if df is not None:
        return df
    _JPEG_CACHE.clear()
    ones = np.ones(64, dtype=np.int32)
    w, h = _JPEG_BW * 8, _JPEG_BH * 8
    rows = []
    for i in range(24):
        consts = hashlib.md5(f"{i}:jpg:0".encode()).digest()[
            : _JPEG_BW * _JPEG_BH
        ]
        grid = np.zeros((h, w), dtype=np.uint8)
        for j, v in enumerate(consts):
            by, bx = divmod(j, _JPEG_BW)
            grid[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
        px = grid.reshape(-1)
        if i % 2 == 0:
            jpg = encode_jpeg_baseline(
                px, w, h, 1, quant_luma=ones,
                restart_interval=2 if i % 4 == 0 else 0,
            )
        else:
            jpg = encode_jpeg_progressive(px, w, h, 1, quant_luma=ones)
        rows.append((i, KIND_IMAGE, jpg))
    # ids 24-31 (r9): REAL libjpeg-turbo ARITHMETIC streams of
    # the same md5-mosaic pattern, embedded as constants (provenance:
    # tests/data/jpeg_arith/gen_embedded.c) — the QM entropy decoder
    # under the same exact-moment value gate; ids % 3 == 0 carry
    # restart intervals (arithmetic coder reinit inside the gate)
    from dataingestiontohana_spark.operators.jpeg_arith_fixtures import (
        ARITH_MOSAIC_JPEGS,
    )

    for i, jpg in sorted(ARITH_MOSAIC_JPEGS.items()):
        rows.append((i, KIND_IMAGE, jpg))
    # ids 32-33 (r10): LOSSLESS SOF3 — per-PIXEL md5 bytes, no mosaic
    # structure needed because lossless decode reproduces EVERY byte
    # (the encode->decode round trip cancels, like the PNG/GIF
    # corpora): gray predictor 4 and 3-component RGB predictor 7
    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_lossless,
    )

    def jpgl_expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:jpgl:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    gray = np.frombuffer(jpgl_expand(32, w * h), np.uint8).reshape(h, w)
    rows.append((32, KIND_IMAGE, encode_jpeg_lossless(gray, predictor=4)))
    # id 38 (r11): POINT-TRANSFORMED lossless (Al=2) — decode is
    # (v >> 2) << 2, so the oracle is the same per-pixel expansion
    # with the low bits masked
    gray38 = np.frombuffer(jpgl_expand(38, w * h), np.uint8).reshape(h, w)
    rows.append((38, KIND_IMAGE, encode_jpeg_lossless(
        gray38, predictor=5, point_transform=2)))
    # id 39 (r12): ROW-ALIGNED restart-interval lossless — DRI = 4
    # lines of MCUs, RSTn every 4 rows with the H.1.1 first-line
    # reset (the unambiguous class; mid-line restarts stay retired).
    # Decode is exact, so the oracle is the same per-pixel expansion.
    gray39 = np.frombuffer(jpgl_expand(39, w * h), np.uint8).reshape(h, w)
    rows.append((39, KIND_IMAGE, encode_jpeg_lossless(
        gray39, predictor=6, restart_interval=w * 4)))
    # id 40 (r12): SUBSAMPLED lossless — 2 components, c0 at H2V2
    # full res and c1 at H1V1 half res (T.81 A.2.4 MCU interleave,
    # per-component prediction grids). Decode is exact and the
    # nearest upsample replicates each c1 sample 4x, so the moments
    # are S0 + 4*S1 (seed ':jpgl:' for c0, ':jpglc:' for c1).
    p40a = np.frombuffer(jpgl_expand(40, w * h), np.uint8).reshape(h, w)

    def jpglc_expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:jpglc:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    p40b = np.frombuffer(
        jpglc_expand(40, (w // 2) * (h // 2)), np.uint8
    ).reshape(h // 2, w // 2)
    rows.append((40, KIND_IMAGE, encode_jpeg_lossless(
        [p40a, p40b], predictor=4, sampling=[(2, 2), (1, 1)])))
    rgb = np.frombuffer(
        jpgl_expand(33, w * h * 3), np.uint8
    ).reshape(h, w, 3)
    rows.append((33, KIND_IMAGE, encode_jpeg_lossless(rgb, predictor=7)))
    # id 34 (r11): NON-INTERLEAVED arithmetic color — the id-24/25/26
    # third-party QM streams spliced verbatim into per-component Ns=1
    # scans (Y keeps id 24's DRI 2, so the value gate also covers
    # restart reinit inside a non-interleaved arithmetic scan). No
    # entropy bit is re-encoded; the oracle recomputes the JFIF
    # conversion of the three md5-constant planes with round_even.
    from dataingestiontohana_spark.operators.multimodal import (
        splice_jpeg_noninterleaved,
    )

    rows.append((34, KIND_IMAGE, splice_jpeg_noninterleaved(
        [ARITH_MOSAIC_JPEGS[k] for k in (24, 25, 26)]
    )))
    # ids 35-37 (r11): the remaining scan-layout boundaries under the
    # value gate. 35 = Huffman PARTIAL-SUBSET scans ([[Y,Cb],[Cr]],
    # DRI 2); 36 = OUR QM ENCODER's interleaved arithmetic stream
    # (gray, DRI 2 — the encoder is the pinned decoder's dual, and
    # this clip adjudicates its output pixel-exactly); 37 = arithmetic
    # PARTIAL-SUBSET scans ([[Y],[Cb,Cr]], DRI 2). 35/37 are
    # GRAY-VALUED RGB mosaics (r=g=b=const): Cb/Cr quantize to
    # exactly 0 and Y's DC is the exact integer 8*(v-128), so decode
    # reproduces every pixel and the oracle is the same md5 block
    # formula x3 channels — no float chain crosses engines.
    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_arith,
    )

    for mid, enc_fn, chans, groups in (
        (35, encode_jpeg_baseline, 3, [[1, 2], [3]]),
        (36, encode_jpeg_arith, 1, None),
        (37, encode_jpeg_arith, 3, [[1], [2, 3]]),
    ):
        consts = hashlib.md5(f"{mid}:jpg:0".encode()).digest()[
            : _JPEG_BW * _JPEG_BH
        ]
        grid = np.zeros((h, w), dtype=np.uint8)
        for j, v in enumerate(consts):
            by, bx = divmod(j, _JPEG_BW)
            grid[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
        px = (np.repeat(grid.reshape(-1), 3) if chans == 3
              else grid.reshape(-1))
        kwargs = {"quant_luma": ones, "restart_interval": 2}
        if chans == 3:
            kwargs["quant_chroma"] = ones
        if groups is not None:
            kwargs["scan_groups"] = groups
        rows.append((mid, KIND_IMAGE, enc_fn(px, w, h, chans, **kwargs)))
    df = (
        _local_rows(spark, rows, 2)
        .localCheckpoint(eager=False)
    )
    _JPEG_CACHE[key] = df
    return df


def q204_jpeg_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-JPEG decode under the VALUE gate: constant-block mosaics
    (see `_jpeg_mosaic_corpus`) through the production `decode_media`
    operator; baseline AND progressive streams of the same pixels must
    land identical exact integer moments, recomputed independently by
    the DuckDB oracle from the md5 seed."""
    return (
        decode_media(_jpeg_mosaic_corpus(spark))
        .select(
            "media_id", "width", "height", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


# Native-width WAV corpus (round 8): 16 REAL RIFF/WAVE streams, 64
# frames each, integer PCM bits cycling 8/16/24/32 with mono AND
# stereo layouts, sample bytes md5-expanded from "{id}:wav:{chunk}" —
# so DuckDB reassembles every little-endian signed sample, folds
# stereo exactly ((l+r) floor-div 2), and recomputes the native-width
# moments, with the 32-bit sum of squares carried through HUGEINT and
# split hi/lo at 10^18 (two full-range squares already exceed bigint).
_WAV_CACHE: dict[str, DataFrame] = {}
_WAV_FRAMES = 64
_ADPCM_BLOCKS = 2  # clips 20-23: 2 x 132-byte blocks, 257 samples each


@locked_frame_builder
def _wav_native_corpus(spark: SparkSession) -> DataFrame:
    import hashlib
    import struct

    key = spark.sparkContext.applicationId
    df = _WAV_CACHE.get(key)
    if df is not None:
        return df
    _WAV_CACHE.clear()

    def md5_expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:wav:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    def container(data: bytes, channels: int, bits: int) -> bytes:
        width = bits // 8
        fmt = struct.pack(
            "<HHIIHH", 1, channels, 8000, 8000 * width * channels,
            width * channels, bits,
        )
        return (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def float_container(data: bytes, channels: int, bits: int) -> bytes:
        width = bits // 8
        fmt = struct.pack(
            "<HHIIHH", 3, channels, 8000, 8000 * width * channels,
            width * channels, bits,
        )
        return (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    rows = []
    for i in range(16):
        bits = (8, 16, 24, 32)[i % 4]
        channels = 1 if bits == 8 else 1 + (i // 4) % 2
        data = md5_expand(i, _WAV_FRAMES * (bits // 8) * channels)
        rows.append((i, KIND_AUDIO, container(data, channels, bits)))
    # >2-channel integer clips 24-27 (r9, closing the >2-channel
    # integer-PCM boundary): same md5 expansion, the fold is the
    # floor of the per-frame channel mean — exact on both engines
    # (numpy // floors; the SQL twin floors SUM(v)/channels, whose
    # magnitude ≤ 6 * 2^31 is double-exact).
    for i, bits, channels in (
        (24, 8, 4), (25, 16, 4), (26, 24, 3), (27, 32, 6),
    ):
        data = md5_expand(i, _WAV_FRAMES * (bits // 8) * channels)
        rows.append((i, KIND_AUDIO, container(data, channels, bits)))
    # IEEE-float clips 16-19 (r9, closing the r8 float boundary):
    # samples planted exactly ON the quantization grid — v = k / 2^g
    # with k from the md5 expansion (stride bytes little-endian, then
    # a mod centering it), so decode + grid quantization recovers k
    # LOSSLESSLY and DuckDB replays every value without IEEE
    # arithmetic. Stereo clips plant EVEN k so the float mid-channel
    # fold (l + r) / 2 stays on the grid (no rounding-mode divergence
    # between numpy half-even and SQL arithmetic — the fold halves an
    # even integer exactly on both engines).
    for i in range(16, 20):
        is64 = i >= 18
        stride, g = (7, 51) if is64 else (4, 23)
        channels = 1 + (i % 2)
        raw = md5_expand(i, _WAV_FRAMES * stride * channels)
        us = [
            int.from_bytes(raw[j * stride : (j + 1) * stride], "little")
            for j in range(_WAV_FRAMES * channels)
        ]
        if channels == 1:
            ks = [(u % (1 << (g + 1))) - (1 << g) for u in us]
        else:
            ks = [2 * ((u % (1 << g)) - (1 << (g - 1))) for u in us]
        vals = [k / float(1 << g) for k in ks]
        data = struct.pack(f"<{len(vals)}{'d' if is64 else 'f'}", *vals)
        rows.append(
            (i, KIND_AUDIO, float_container(data, channels, 64 if is64 else 32))
        )
    # 4-channel float clips 28-29 (r9, closing the >2-channel float
    # boundary): k planted as multiples of 4 so the 4-way fold
    # SUM(k)/4 is an exact grid integer on both engines (the sum of
    # four on-grid dyadics is exact in float64 and the division by a
    # power of 2 only shifts the exponent).
    for i in (28, 29):
        is64 = i == 29
        stride, g = (7, 51) if is64 else (4, 23)
        raw = md5_expand(i, _WAV_FRAMES * stride * 4)
        us = [
            int.from_bytes(raw[j * stride : (j + 1) * stride], "little")
            for j in range(_WAV_FRAMES * 4)
        ]
        ks = [4 * ((u % (1 << (g - 1))) - (1 << (g - 2))) for u in us]
        vals = [k / float(1 << g) for k in ks]
        data = struct.pack(f"<{len(vals)}{'d' if is64 else 'f'}", *vals)
        rows.append(
            (i, KIND_AUDIO, float_container(data, 4, 64 if is64 else 32))
        )
    # IMA-ADPCM clips 20-23 (r9, closing the declared ADPCM
    # boundary): 2 blocks of blockAlign 132 (4-byte header + 128
    # nibble bytes = 257 samples/block). The nibble stream is
    # md5-expanded from "{id}:adpcm:{c}" and the per-block header
    # (initial predictor / step index) comes from a plain integer
    # formula, so the DuckDB oracle reconstructs the exact encoded
    # stream and replays the IMA state machine as a recursive CTE —
    # the decode is adjudicated sample-exactly despite the codec
    # being lossy (the ENCODED stream is the planted ground truth).
    for i in range(20, 24):
        nib = bytearray()
        c = 0
        while len(nib) < _ADPCM_BLOCKS * 128:
            nib += hashlib.md5(f"{i}:adpcm:{c}".encode()).digest()
            c += 1
        data = b"".join(
            struct.pack(
                "<hBB",
                ((i * 8191 + blk * 2713) % 65536) - 32768,
                (i * 31 + blk * 17) % 89,
                0,
            )
            + bytes(nib[blk * 128 : (blk + 1) * 128])
            for blk in range(_ADPCM_BLOCKS)
        )
        fmt = struct.pack(
            "<HHIIHHHH", 17, 1, 8000, 4110, 132, 4, 2, 257
        )  # cbSize=2, wSamplesPerBlock=257
        rows.append((
            i,
            KIND_AUDIO,
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data,
        ))
    # STEREO IMA-ADPCM clips 30-31 (r9, closing the stereo-ADPCM
    # boundary): blockAlign 72 = two 4-byte channel headers + 64 body
    # bytes in 4-byte channel-interleaved groups (64 nibbles = 65
    # samples per channel per block). The fold is the integer-PCM
    # floor-of-mean contract; the oracle walks BOTH channel state
    # machines recursively and joins them per sample index.
    for i in (30, 31):
        body_all = bytearray()
        c2 = 0
        while len(body_all) < _ADPCM_BLOCKS * 64:
            body_all += hashlib.md5(f"{i}:adpcm2:{c2}".encode()).digest()
            c2 += 1
        data = b"".join(
            b"".join(
                struct.pack(
                    "<hBB",
                    ((i * 8191 + blk * 2713 + ch * 977) % 65536) - 32768,
                    (i * 31 + blk * 17 + ch * 5) % 89,
                    0,
                )
                for ch in range(2)
            )
            + bytes(body_all[blk * 64 : (blk + 1) * 64])
            for blk in range(_ADPCM_BLOCKS)
        )
        fmt = struct.pack(
            "<HHIIHHHH", 17, 2, 8000, 8220, 72, 4, 2, 65
        )
        rows.append((
            i,
            KIND_AUDIO,
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data,
        ))
    # PARTIAL-FINAL-BLOCK clips 32-33 (r10, closing the r9 declared
    # partial-block boundary — real IMA streams end mid-block
    # routinely). Clip 32 (mono): two full 132-byte blocks + a final
    # 64-byte block (4-byte header + 60 nibble bytes = 121 samples);
    # the nibble stream simply CONTINUES the same "{id}:adpcm:{c}"
    # expansion at offset blk*128, so the oracle's recursive walk only
    # needs a per-block step bound. Clip 33 (stereo): one full
    # 72-byte block + a final 40-byte block (two 4-byte headers + 32
    # body bytes = four whole channel-interleaved groups = 33 frames).
    i = 32
    nib = bytearray()
    c = 0
    while len(nib) < 2 * 128 + 60:
        nib += hashlib.md5(f"{i}:adpcm:{c}".encode()).digest()
        c += 1
    data = b"".join(
        struct.pack(
            "<hBB",
            ((i * 8191 + blk * 2713) % 65536) - 32768,
            (i * 31 + blk * 17) % 89,
            0,
        )
        + bytes(nib[blk * 128 : blk * 128 + (60 if blk == 2 else 128)])
        for blk in range(3)
    )
    fmt = struct.pack("<HHIIHHHH", 17, 1, 8000, 4110, 132, 4, 2, 257)
    rows.append((
        i,
        KIND_AUDIO,
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data,
    ))
    i = 33
    body_all = bytearray()
    c2 = 0
    while len(body_all) < 64 + 32:
        body_all += hashlib.md5(f"{i}:adpcm2:{c2}".encode()).digest()
        c2 += 1
    data = b"".join(
        b"".join(
            struct.pack(
                "<hBB",
                ((i * 8191 + blk * 2713 + ch * 977) % 65536) - 32768,
                (i * 31 + blk * 17 + ch * 5) % 89,
                0,
            )
            for ch in range(2)
        )
        + bytes(body_all[blk * 64 : blk * 64 + (32 if blk == 1 else 64)])
        for blk in range(2)
    )
    fmt = struct.pack("<HHIIHHHH", 17, 2, 8000, 8220, 72, 4, 2, 65)
    rows.append((
        i,
        KIND_AUDIO,
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data,
    ))
    # 3-CHANNEL ADPCM clip 36 (r10, closing the r9 >2-channel ADPCM
    # boundary): blockAlign 60 = three 4-byte channel headers + 48
    # body bytes in 12-byte channel-interleaved group triples (32
    # nibbles per channel per block); fold = floor of the 3-channel
    # mean, oracle = three recursive walks grouped per sample index.
    i = 36
    body_all = bytearray()
    c3 = 0
    while len(body_all) < 2 * 48:
        body_all += hashlib.md5(f"{i}:adpcm3:{c3}".encode()).digest()
        c3 += 1
    data = b"".join(
        b"".join(
            struct.pack(
                "<hBB",
                ((i * 8191 + blk * 2713 + ch * 977) % 65536) - 32768,
                (i * 31 + blk * 17 + ch * 5) % 89,
                0,
            )
            for ch in range(3)
        )
        + bytes(body_all[blk * 48 : (blk + 1) * 48])
        for blk in range(2)
    )
    fmt = struct.pack("<HHIIHHHH", 17, 3, 8000, 12330, 60, 4, 2, 33)
    rows.append((
        i,
        KIND_AUDIO,
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data,
    ))
    # G.711 clips 34-35 (r10, closing part of the non-PCM fmt-tag
    # boundary — telephony audio): mu-law mono (fmt tag 7) and A-law
    # stereo (fmt tag 6), one byte per sample per channel straight
    # from the same "{id}:wav:{c}" expansion; the oracle recomputes
    # the segment-decode ARITHMETIC in SQL (no table literals cross
    # engines) and folds stereo floor-of-mean like integer PCM.
    for i, tag, channels in ((34, 7, 1), (35, 6, 2)):
        data = md5_expand(i, _WAV_FRAMES * channels)
        fmt = struct.pack(
            "<HHIIHH", tag, channels, 8000, 8000 * channels, channels, 8
        )
        rows.append((
            i,
            KIND_AUDIO,
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data,
        ))
    # MS-ADPCM clips 37-38 (r11, closing the second-most-common
    # compressed-WAV boundary after IMA — fmt tag 2). Clip 37 (mono):
    # two 71-byte blocks (7-byte header + 64 body bytes = 128
    # nibbles, HIGH nibble first = 130 samples/block). Clip 38
    # (stereo): one full 78-byte block (14-byte header + 64 body
    # bytes; each body byte is one frame: ch0 high nibble, ch1 low)
    # + a PARTIAL final block (14-byte header + 32 body bytes = 34
    # frames) — the same fact-chunk-truncated tail shape the IMA
    # clips 32-33 pinned. Every header field is a plain integer
    # formula and the body is md5-expanded from "{id}:msadpcm:{c}",
    # so the DuckDB oracle reconstructs the exact encoded stream and
    # replays the coefficient-pair predictor + idelta adaptation as a
    # recursive CTE — the lossy codec adjudicated sample-exactly
    # because the ENCODED stream is the planted ground truth.
    def _ms_hdr(i: int, blk: int, channels: int) -> bytes:
        preds = bytes(
            (i * 7 + blk * 3 + ch) % 7 for ch in range(channels)
        )
        deltas = struct.pack(
            f"<{channels}h",
            *(16 + (i * 97 + blk * 53 + ch * 29) % 4000
              for ch in range(channels)),
        )
        s1s = struct.pack(
            f"<{channels}h",
            *(((i * 8191 + blk * 2713 + ch * 977) % 65536) - 32768
              for ch in range(channels)),
        )
        s2s = struct.pack(
            f"<{channels}h",
            *(((i * 4099 + blk * 1511 + ch * 641) % 65536) - 32768
              for ch in range(channels)),
        )
        return preds + deltas + s1s + s2s

    def _ms_fmt(channels: int, block_align: int, spb: int) -> bytes:
        from dataingestiontohana_spark.operators.multimodal import (
            _MS_ADPCM_COEF1,
            _MS_ADPCM_COEF2,
        )

        fmt = struct.pack(
            "<HHIIHHHHH", 2, channels, 8000,
            8000 * block_align // spb, block_align, 4,
            4 + 7 * 4, spb, 7,
        )
        return fmt + b"".join(
            struct.pack("<hh", a, c)
            for a, c in zip(_MS_ADPCM_COEF1, _MS_ADPCM_COEF2)
        )

    for i, channels, bodies in (
        (37, 1, (64, 64)),
        (38, 2, (64, 32)),
    ):
        body_all = bytearray()
        cms = 0
        while len(body_all) < 64 * len(bodies):
            body_all += hashlib.md5(f"{i}:msadpcm:{cms}".encode()).digest()
            cms += 1
        data = b"".join(
            _ms_hdr(i, blk, channels)
            + bytes(body_all[blk * 64 : blk * 64 + nb])
            for blk, nb in enumerate(bodies)
        )
        align = 7 * channels + 64
        spb = 2 + 64 * 2 // channels
        fmt = _ms_fmt(channels, align, spb)
        rows.append((
            i,
            KIND_AUDIO,
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data,
        ))
    # WAVE_FORMAT_EXTENSIBLE clips 39-40 (r12 — the modern wrapper
    # most multichannel/high-bit-depth writers emit, fmt tag 0xFFFE):
    # the real codec rides in the SubFormat GUID (classic tag + the
    # fixed KSDATAFORMAT tail). Clip 39 wraps 16-bit stereo integer
    # PCM (the clip-1 data formula verbatim), clip 40 wraps 32-bit
    # float mono (the clip-16 grid-planting math verbatim) — the
    # oracle arms extend by ONE spec row each because the sample
    # bytes are the same expansions; only the container header
    # differs, and the dispatch remap is what's under test.
    from dataingestiontohana_spark.operators.multimodal import (
        _KS_GUID_TAIL,
    )

    def ext_container(
        data: bytes, channels: int, bits: int, sub_tag: int
    ) -> bytes:
        width = bits // 8
        fmt = struct.pack(
            "<HHIIHH", 0xFFFE, channels, 8000,
            8000 * width * channels, width * channels, bits,
        ) + struct.pack("<HHI", 22, bits, (1 << channels) - 1) + (
            struct.pack("<H", sub_tag) + _KS_GUID_TAIL
        )
        return (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    data39 = md5_expand(39, _WAV_FRAMES * 2 * 2)
    rows.append((39, KIND_AUDIO, ext_container(data39, 2, 16, 1)))
    raw40 = md5_expand(40, _WAV_FRAMES * 4)
    us40 = [
        int.from_bytes(raw40[j * 4 : (j + 1) * 4], "little")
        for j in range(_WAV_FRAMES)
    ]
    ks40 = [(u % (1 << 24)) - (1 << 23) for u in us40]
    vals40 = [k / float(1 << 23) for k in ks40]
    data40 = struct.pack(f"<{len(vals40)}f", *vals40)
    rows.append((40, KIND_AUDIO, ext_container(data40, 1, 32, 3)))
    df = (
        _local_rows(spark, rows, 2)
        .localCheckpoint(eager=False)
    )
    _WAV_CACHE[key] = df
    return df


def q205_wav_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-native-width WAV decode under the VALUE gate: real RIFF
    streams at 8/16/24/32-bit integer PCM AND 32/64-bit IEEE-float
    PCM (fmt tag 3 — r9, closing the r8 declared float boundary),
    mono and stereo, through the production decode path
    (`operators/multimodal.py::_parse_wav`) — the adjudicated columns
    are the exact native-sample moments (float clips on the lossless
    2^23 / 2^51 quantization grid their samples are planted on), the
    wide sums of squares split hi/lo so a bigint schema carries the
    hugeint exactly (closed the r7 int16-precision boundary; float
    closed r9)."""
    from dataingestiontohana_spark.operators.multimodal import (
        wav_native_moments,
    )

    return wav_native_moments(_wav_native_corpus(spark)).orderBy("media_id")


# 16-bit PNG corpus (round 8): 12 REAL PNGs, one per (color type x
# interlace) combination at depth 16, native big-endian samples
# md5-expanded from "{id}:png16:{chunk}" (sample j = 256*byte(2j) +
# byte(2j+1)); the encode->decode round trip cancels so DuckDB
# recomputes the NATIVE uint16 moments straight from the expansion.
_PNG16_CACHE: dict[str, DataFrame] = {}
_PNG16_CH = (1, 3, 2, 4)  # color types 0 / 2 / 4 / 6


@locked_frame_builder
def _png16_corpus(spark: SparkSession) -> DataFrame:
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import encode_png

    key = spark.sparkContext.applicationId
    df = _PNG16_CACHE.get(key)
    if df is not None:
        return df
    _PNG16_CACHE.clear()

    def md5_expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:png16:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    rows = []
    for i in range(12):
        ct = (0, 2, 4, 6)[i % 4]
        ch = _PNG16_CH[i % 4]
        raw = md5_expand(i, _PNG_W * _PNG_H * ch * 2)
        a16 = np.frombuffer(raw, ">u2")
        shape = (_PNG_H, _PNG_W) if ch == 1 else (_PNG_H, _PNG_W, ch)
        png = encode_png(
            a16.reshape(shape), ct, filters=(0, 1, 2, 3, 4),
            interlace=i % 2, bit_depth=16,
        )
        rows.append((i, KIND_IMAGE, png))
    # tRNS rows 12-13 (r9): 16-bit gray and RGB transparency keys —
    # the key is the image's own FIRST SAMPLE (big-endian pair of the
    # expansion's bytes 0-1), so at least one pixel matches and the
    # alpha channel (0 / 65535 at depth 16) enters the value gate. The
    # RGB image plants r=g=b so the oracle alpha stays per-sample.
    for i in (12, 13):
        raw = md5_expand(i, _PNG_W * _PNG_H * 2)
        s16 = np.frombuffer(raw, ">u2")
        key16 = int(s16[0])
        if i == 12:
            png = encode_png(
                s16.reshape(_PNG_H, _PNG_W), 0, filters=(0, 1, 2, 3, 4),
                bit_depth=16, trns=key16,
            )
        else:
            arr = np.repeat(s16, 3).reshape(_PNG_H, _PNG_W, 3)
            png = encode_png(
                arr, 2, filters=(0, 1, 2, 3, 4), interlace=1,
                bit_depth=16, trns=(key16,) * 3,
            )
        rows.append((i, KIND_IMAGE, png))
    df = (
        _local_rows(spark, rows, 2)
        .localCheckpoint(eager=False)
    )
    _PNG16_CACHE[key] = df
    return df


def q206_png16_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit PNG decode at FULL NATIVE PRECISION under the value
    gate: every 16-bit color type, plain and Adam7, full filter mix,
    through the production `decode_media` operator — the adjudicated
    moments are over the native uint16 samples, which the DuckDB
    oracle recomputes from the md5 expansion (closes the r7 declared
    high-byte-precision boundary)."""
    return (
        decode_media(_png16_corpus(spark))
        .select(
            "media_id", "width", "height", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


_GIFBMP_CACHE: dict[str, DataFrame] = {}


@locked_frame_builder
def _gif_bmp_corpus(spark: SparkSession) -> DataFrame:
    """REAL GIF + BMP streams whose decode is exact (r9): GIFs carry
    md5-derived palette indices through genuine LZW compression
    (plain, interlaced, and 89a-transparent variants — the alpha
    channel enters the value gate); BMPs cover 24-bit BGR and 8-bit
    palette, bottom-up AND top-down (moments are row-order-invariant,
    so one oracle formula adjudicates both orientations). The
    encode->decode round trip cancels, so DuckDB recomputes every
    channel byte from the expansion like the PNG corpora."""
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import (
        encode_bmp,
        encode_bmp_rle,
        encode_gif,
        encode_gif_frames,
    )

    key = spark.sparkContext.applicationId
    df = _GIFBMP_CACHE.get(key)
    if df is not None:
        return df
    _GIFBMP_CACHE.clear()

    def md5_expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:gb:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    pal = np.array(
        [[(k * 37) % 256, (k * 59) % 256, (k * 83) % 256] for k in range(64)],
        dtype=np.uint8,
    )
    rows = []
    for i in range(18):
        kind = KIND_IMAGE
        if i < 4:  # GIF: plain/interlaced x opaque/transparent(idx 7)
            raw = md5_expand(i, _PNG_W * _PNG_H)
            idx = (np.frombuffer(raw, np.uint8) % 64).reshape(
                _PNG_H, _PNG_W
            )
            blob = encode_gif(
                idx, pal, interlace=bool(i % 2),
                transparent=7 if i >= 2 else -1,
            )
        elif i < 6:  # BMP 24-bit, bottom-up then top-down
            raw = md5_expand(i, _PNG_W * _PNG_H * 3)
            arr = np.frombuffer(raw, np.uint8).reshape(_PNG_H, _PNG_W, 3)
            blob = encode_bmp(arr, top_down=bool(i % 2))
        elif i < 8:  # BMP 8-bit palette, bottom-up then top-down
            raw = md5_expand(i, _PNG_W * _PNG_H)
            idx = (np.frombuffer(raw, np.uint8) % 64).reshape(
                _PNG_H, _PNG_W
            )
            blob = encode_bmp(idx, palette=pal, top_down=bool(i % 2))
        elif i == 8:  # ANIMATED GIF (r10): 3 full-canvas opaque frames
            kind = KIND_VIDEO
            raw = md5_expand(i, 3 * _PNG_W * _PNG_H)
            v = np.frombuffer(raw, np.uint8) % 64
            blob = encode_gif_frames(
                (_PNG_W, _PNG_H),
                [(v[f * 128 : (f + 1) * 128].reshape(_PNG_H, _PNG_W),
                  0, 0, 1, -1) for f in range(3)],
                pal,
            )
        elif i == 10:  # r12: BI_RLE8 (runs + absolute segments)
            raw = md5_expand(i, _PNG_W * _PNG_H)
            idx = (np.frombuffer(raw, np.uint8) % 64).reshape(
                _PNG_H, _PNG_W
            )
            blob = encode_bmp_rle(idx, pal)
        elif i == 11:  # r12: BI_RLE4 (nibble runs)
            raw = md5_expand(i, _PNG_W * _PNG_H)
            idx = (np.frombuffer(raw, np.uint8) % 16).reshape(
                _PNG_H, _PNG_W
            )
            blob = encode_bmp_rle(idx, pal[:16], four_bit=True)
        elif i == 12:  # r12: 4-bit packed palette, top-down
            raw = md5_expand(i, _PNG_W * _PNG_H)
            idx = (np.frombuffer(raw, np.uint8) % 16).reshape(
                _PNG_H, _PNG_W
            )
            blob = encode_bmp(
                idx, palette=pal[:16], bits=4, top_down=True
            )
        elif i == 13:  # r12: 1-bit packed palette
            raw = md5_expand(i, _PNG_W * _PNG_H)
            idx = (np.frombuffer(raw, np.uint8) % 2).reshape(
                _PNG_H, _PNG_W
            )
            blob = encode_bmp(idx, palette=pal[:2], bits=1)
        elif i == 14:  # r12: 16-bit X1R5G5B5, top-down — channels on
            # the 5-bit replication grid so quantization cancels
            raw = md5_expand(i, _PNG_W * _PNG_H * 3)
            v5 = np.frombuffer(raw, np.uint8) % 32
            arr = ((v5 << 3) | (v5 >> 2)).reshape(_PNG_H, _PNG_W, 3)
            blob = encode_bmp(arr, bits=16, top_down=True)
        elif i == 15:  # r12: 16-bit 565 BI_BITFIELDS (G on the 6-bit
            # grid, R/B on the 5-bit grid)
            raw = md5_expand(i, _PNG_W * _PNG_H * 3)
            bs = np.frombuffer(raw, np.uint8)
            v5, v6 = bs % 32, bs % 64
            arr = (
                np.where(
                    np.arange(bs.size) % 3 == 1,
                    (v6 << 2) | (v6 >> 4),
                    (v5 << 3) | (v5 >> 2),
                )
                .astype(np.uint8)
                .reshape(_PNG_H, _PNG_W, 3)
            )
            blob = encode_bmp(
                arr, bits=16, masks=(0xF800, 0x07E0, 0x001F)
            )
        elif i == 16:  # r12: 32-bit BGRX, top-down
            raw = md5_expand(i, _PNG_W * _PNG_H * 3)
            arr = np.frombuffer(raw, np.uint8).reshape(
                _PNG_H, _PNG_W, 3
            )
            blob = encode_bmp(arr, bits=32, top_down=True)
        elif i == 17:  # r12: BITMAPCOREHEADER, 8-bit triple palette
            raw = md5_expand(i, _PNG_W * _PNG_H)
            idx = (np.frombuffer(raw, np.uint8) % 64).reshape(
                _PNG_H, _PNG_W
            )
            blob = encode_bmp(idx, palette=pal, core=True)
        else:  # ANIMATED GIF (r10): transparency + partial rects +
            # disposal 2 — the compositing model under the value gate.
            # Frame 0 full opaque; frame 1 an 8x4 rect at (4,2) with
            # transparent index 7 and restore-to-background disposal;
            # frame 2 an 8x4 rect at (0,4), also keyed on 7.
            kind = KIND_VIDEO
            raw = md5_expand(i, 192)
            v = np.frombuffer(raw, np.uint8) % 64
            blob = encode_gif_frames(
                (_PNG_W, _PNG_H),
                [
                    (v[:128].reshape(_PNG_H, _PNG_W), 0, 0, 1, -1),
                    (v[128:160].reshape(4, 8), 4, 2, 2, 7),
                    (v[160:192].reshape(4, 8), 0, 4, 1, 7),
                ],
                pal,
            )
        rows.append((i, kind, blob))
    df = (
        _local_rows(spark, rows, 2)
        .localCheckpoint(eager=False)
    )
    _GIFBMP_CACHE[key] = df
    return df


def q215_gif_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF + BMP decode under the VALUE gate (r9 new formats): real
    LZW-compressed GIF87a-style frames (interlace and transparency
    included — transparency expands RGBA and the alpha bytes are
    adjudicated) and BI_RGB BMPs in both row orders, through the
    production `decode_media`; the oracle recomputes every decoded
    channel byte from the md5 expansion. The LZW decoder is
    additionally pinned against REAL third-party GIF streams in
    pytest (dictionary-growth timing is where homegrown LZW desyncs).
    r10 adds two ANIMATED GIFs: three full-canvas opaque frames
    (media 8, the frame loop alone) and a transparency + partial-rect
    + restore-to-background composition (media 9) whose every
    composited channel byte the oracle replays pixel-by-pixel; the
    n_frames column joins the gate so the frame count itself is
    adjudicated."""
    return (
        decode_media(
            _gif_bmp_corpus(spark).where(F.col("media_id") < 10)
        )
        .select(
            "media_id", "width", "height", "n_frames", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


def q230_bmp_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The completed BMP surface under the VALUE gate (r12 — closing
    the r9 declared boundaries): BI_RLE8 and BI_RLE4 decompression
    (runs, absolute segments, end-of-line/bitmap escapes), packed
    4-bit and 1-bit palettes, 16-bit X1R5G5B5 and 565 BI_BITFIELDS
    masks expanded by the pinned bit-replication rule, 32-bit BGRX,
    and BITMAPCOREHEADER triple palettes — corpus media 10-17, every
    decoded channel byte recomputed by the oracle from the md5
    expansion (the 16-bit fixtures sit on the replication grid so
    encode-side quantization cancels exactly)."""
    return (
        decode_media(
            _gif_bmp_corpus(spark).where(F.col("media_id") >= 10)
        )
        .select(
            "media_id", "width", "height", "n_frames", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


def q221_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF frame sampling under the VALUE gate (r10): the
    two animated corpus entries flow through the production
    `sample_frames` operator (every_k=1 — keep every frame), emitting
    one row per composited frame with its exact byte-sum checksum, so
    the oracle adjudicates each frame INDIVIDUALLY (q215 gates the
    whole-file aggregate; this gates the per-frame slices, including
    the disposal-2 restore whose effect only shows in frame 3 of
    media 9)."""
    vids = _gif_bmp_corpus(spark).where(F.col("kind") == KIND_VIDEO)
    return (
        sample_frames(vids, every_k=1)
        .select("media_id", "frame_idx", "frame_px_sum")
        .orderBy("media_id", "frame_idx")
    )


_CMYK_CACHE: dict[str, DataFrame] = {}


@locked_frame_builder
def _cmyk_corpus(spark: SparkSession) -> DataFrame:
    """REAL Adobe 4-component JPEG streams whose decode is EXACT
    (r12 — closing the CMYK boundary): each clip is a 3x2 mosaic of
    constant 8x8 blocks at unit quantization (the q204 discipline),
    plane p of clip i taking its 6 block constants from
    md5('{i}:cmyk:{p}'), so the decoder reproduces every stored
    component byte and the SQL oracle recomputes the pinned
    ``channel = c * k // 255`` composite per block. Clips: 0 =
    transform-0 CMYK (stored inverted-ink planes); 1 = transform-2
    YCCK with Cb = Cr = 128 (chroma planes quantize to zero, so the
    YCC->CMY conversion returns Y exactly — stored c = m = y = Y);
    2 = transform-0 in the NON-INTERLEAVED four-scan layout (A.2.2
    through the coefficient accumulator); 3 = four components WITHOUT
    an APP14 marker — the inversion convention is unknowable, so the
    contract is header metadata + NULL moments, never guessed
    pixels."""
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_cmyk,
    )

    key = spark.sparkContext.applicationId
    df = _CMYK_CACHE.get(key)
    if df is not None:
        return df
    _CMYK_CACHE.clear()

    def plane(i: int, p: int) -> np.ndarray:
        vals = np.frombuffer(
            hashlib.md5(f"{i}:cmyk:{p}".encode()).digest()[:6],
            np.uint8,
        ).reshape(2, 3)
        return np.kron(vals, np.ones((8, 8), np.uint8))

    rows = []
    for i in range(4):
        if i == 1:  # YCCK: Y + flat chroma + K
            y = plane(i, 0)
            flat = np.full_like(y, 128)
            stored = np.stack([y, flat, flat, plane(i, 3)], axis=-1)
        else:
            stored = np.stack([plane(i, p) for p in range(4)], axis=-1)
        blob = encode_jpeg_cmyk(
            stored.reshape(-1),
            24,
            16,
            transform=2 if i == 1 else 0,
            non_interleaved=i == 2,
            app14=i != 3,
        )
        rows.append((i, KIND_IMAGE, blob))
    df = (
        _local_rows(spark, rows, 1)
        .localCheckpoint(eager=False)
    )
    _CMYK_CACHE[key] = df
    return df


def q231_jpeg_cmyk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adobe 4-component JPEG under the VALUE gate (r12): transform-0
    CMYK, transform-2 YCCK, and the non-interleaved four-scan layout
    decode through the production `decode_media`; the oracle
    recomputes every composited channel from the md5 block seeds via
    the pinned integer rule c*k//255. The APP14-less clip adjudicates
    the metadata-only contract (dims + NULL moments)."""
    return (
        decode_media(_cmyk_corpus(spark))
        .select(
            "media_id", "width", "height", "n_frames", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


_MOV_CACHE: dict[str, DataFrame] = {}


@locked_frame_builder
def _mov_corpus(spark: SparkSession) -> DataFrame:
    """REAL QuickTime/MOV MJPEG movies whose decode is EXACT (r12 —
    the second video container): the q204 discipline again — frame f
    of clip i is a 3x2 constant-block mosaic at unit quantization
    seeded from md5('{i}:mov:{f}'), muxed through `encode_mov_mjpeg`
    into genuine moov/trak/stbl sample tables. Clips: 0 = baseline,
    one chunk per sample; 1 = progressive frames with TWO samples per
    chunk (the stsc run expansion under the gate); 2 = sample format
    'mjpa' (fielded MJPEG-A): VALID-UNSUPPORTED — stsd dims + stsz
    frame count, NULL moments, never quarantined; 3 = gray-valued RGB
    baseline (Cb/Cr quantize to exactly 0, the clip-35/37 trick) so
    the 3-channel path is adjudicated in this container too."""
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
        encode_mov_mjpeg,
    )

    key = spark.sparkContext.applicationId
    df = _MOV_CACHE.get(key)
    if df is not None:
        return df
    _MOV_CACHE.clear()
    ones = np.ones(64, dtype=np.int32)
    w, h = _JPEG_BW * 8, _JPEG_BH * 8

    def mosaic(mid: int, f: int) -> np.ndarray:
        consts = hashlib.md5(f"{mid}:mov:{f}".encode()).digest()[
            : _JPEG_BW * _JPEG_BH
        ]
        grid = np.zeros((h, w), dtype=np.uint8)
        for j, v in enumerate(consts):
            by, bx = divmod(j, _JPEG_BW)
            grid[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
        return grid.reshape(-1)

    rows = []
    f0 = [
        encode_jpeg_baseline(mosaic(0, f), w, h, 1, quant_luma=ones)
        for f in range(3)
    ]
    rows.append((0, KIND_VIDEO, encode_mov_mjpeg(f0, w, h)))
    f1 = [
        encode_jpeg_progressive(mosaic(1, f), w, h, 1, quant_luma=ones)
        for f in range(2)
    ]
    rows.append(
        (1, KIND_VIDEO, encode_mov_mjpeg(f1, w, h, chunked=True))
    )
    rows.append(
        (2, KIND_VIDEO, encode_mov_mjpeg(f0, w, h, fmt=b"mjpa"))
    )
    f3 = [
        encode_jpeg_baseline(
            np.repeat(mosaic(3, f), 3), w, h, 3,
            quant_luma=ones, quant_chroma=ones,
        )
        for f in range(2)
    ]
    rows.append((3, KIND_VIDEO, encode_mov_mjpeg(f3, w, h)))
    df = (
        _local_rows(spark, rows, 1)
        .localCheckpoint(eager=False)
    )
    _MOV_CACHE[key] = df
    return df


_TIFF_CACHE: dict[str, DataFrame] = {}


@locked_frame_builder
def _tiff_corpus(spark: SparkSession) -> DataFrame:
    """REAL baseline TIFF streams whose decode is EXACT (r12): every
    sample byte md5-expanded from '{i}:tiff:{c}', written by
    `encode_tiff` with real IFDs and strip tables. Media: 0 = 8-bit
    grayscale BlackIsZero, PackBits, multi-strip, little-endian; 1 =
    8-bit grayscale WHITEISZERO, big-endian (stored bytes are the
    expansion — decode inverts per spec); 2 = 8-bit RGB, multi-strip,
    little-endian; 3 = palette through the 37/59/83 ColorMap,
    PackBits, big-endian; 4 = 1-bit bilevel (MSB-first packed rows
    ARE the expansion bytes); 5 = the LZW compression flag — a VALID
    UNSUPPORTED layout, dims + metadata-only."""
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import (
        encode_tiff,
    )

    key = spark.sparkContext.applicationId
    df = _TIFF_CACHE.get(key)
    if df is not None:
        return df
    _TIFF_CACHE.clear()

    def md5_expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:tiff:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    W, H = 16, 8
    rows = []
    g0 = np.frombuffer(md5_expand(0, W * H), np.uint8).reshape(H, W)
    rows.append((0, KIND_IMAGE, encode_tiff(g0, 1, 32773, 3)))
    g1 = np.frombuffer(md5_expand(1, W * H), np.uint8).reshape(H, W)
    rows.append((1, KIND_IMAGE, encode_tiff(g1, 0, 1, 0, True)))
    rgb = np.frombuffer(md5_expand(2, W * H * 3), np.uint8).reshape(
        H, W, 3
    )
    rows.append((2, KIND_IMAGE, encode_tiff(rgb, 2, 1, 2)))
    pal = np.array(
        [[(k * 37) % 256, (k * 59) % 256, (k * 83) % 256]
         for k in range(256)],
        dtype=np.uint8,
    )
    idx = np.frombuffer(md5_expand(3, W * H), np.uint8).reshape(H, W)
    rows.append((3, KIND_IMAGE, encode_tiff(
        idx, 3, 32773, 0, True, colormap=pal)))
    packed = np.frombuffer(md5_expand(4, H * (W // 8)), np.uint8)
    bil = np.unpackbits(packed.reshape(H, W // 8), axis=1)
    rows.append((4, KIND_IMAGE, encode_tiff(bil, 1, 1)))
    blob5 = bytearray(encode_tiff(g0, 1))
    import struct as _s

    at = blob5.find(_s.pack("<HHI", 259, 3, 1))
    blob5[at + 8 : at + 10] = _s.pack("<H", 5)  # Compression = LZW
    rows.append((5, KIND_IMAGE, bytes(blob5)))
    df = (
        _local_rows(spark, rows, 1)
        .localCheckpoint(eager=False)
    )
    _TIFF_CACHE[key] = df
    return df


def q236_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline TIFF under the VALUE gate (r12 — the last common
    still-image container): grayscale in BOTH photometric polarities,
    RGB, palette, and bilevel strips in both byte orders with real
    PackBits compression through the production `decode_media`; the
    oracle recomputes every decoded channel byte from the md5
    expansion (WhiteIsZero replays the 255-b inversion, bilevel
    replays the MSB-first bit unpack, palette the 37/59/83 map); the
    LZW-flagged clip adjudicates the metadata-only contract."""
    return (
        decode_media(_tiff_corpus(spark))
        .select(
            "media_id", "width", "height", "n_frames", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


_APNG_CACHE: dict[str, DataFrame] = {}


@locked_frame_builder
def _apng_corpus(spark: SparkSession) -> DataFrame:
    """REAL APNG streams whose decode is EXACT (r12): md5-seeded
    frames through `encode_apng` (real zlib streams, acTL/fcTL/fdAT
    sequence numbers). Media: 0 = RGBA, two full-canvas SOURCE-blend
    frames (frame 0 in IDAT — every canvas byte incl. alpha IS the
    expansion); 1 = palette + binary tRNS with OVER blending, a
    dispose-BACKGROUND rect and a second partial rect (the GIF
    media-9 compositing model transposed to APNG operations); 2 =
    fractional-alpha OVER — implementation-defined rounding across
    real decoders, so the file is honestly metadata-only; 3 =
    grayscale full-canvas pair in the hidden-default-image layout
    (every frame in fdAT, the IDAT default image NOT part of the
    animation)."""
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import (
        encode_apng,
    )

    key = spark.sparkContext.applicationId
    df = _APNG_CACHE.get(key)
    if df is not None:
        return df
    _APNG_CACHE.clear()

    def md5_expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:apng:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    W, H = 16, 8
    rows = []
    raw = np.frombuffer(md5_expand(0, 2 * W * H * 4), np.uint8)
    f0 = raw[: W * H * 4].reshape(H, W, 4)
    f1 = raw[W * H * 4 :].reshape(H, W, 4)
    rows.append((0, KIND_VIDEO, encode_apng(
        (W, H), [(f0, 0, 0, 0, 0), (f1, 0, 0, 0, 0)])))
    pal = np.array(
        [[(k * 37) % 256, (k * 59) % 256, (k * 83) % 256]
         for k in range(16)],
        dtype=np.uint8,
    )
    raw = np.frombuffer(md5_expand(1, 192), np.uint8)
    base = (raw[:128] % 15 + 1).reshape(H, W).astype(np.uint8)
    r1 = (raw[128:160] % 16).reshape(4, 8).astype(np.uint8)
    r2 = (raw[160:192] % 16).reshape(4, 8).astype(np.uint8)
    rows.append((1, KIND_VIDEO, encode_apng(
        (W, H),
        [(base, 0, 0, 0, 0), (r1, 4, 2, 1, 1), (r2, 0, 4, 0, 1)],
        color_type=3, palette=pal, trns=b"\x00",
    )))
    fa = np.array(f0)
    fa[:, :, 3] = 128
    rows.append((2, KIND_VIDEO, encode_apng(
        (W, H), [(f0, 0, 0, 0, 0), (fa, 0, 0, 0, 1)])))
    raw = np.frombuffer(md5_expand(3, 2 * W * H), np.uint8)
    g0 = raw[: W * H].reshape(H, W)
    g1 = raw[W * H :].reshape(H, W)
    rows.append((3, KIND_VIDEO, encode_apng(
        (W, H), [(g0, 0, 0, 0, 0), (g1, 0, 0, 0, 0)],
        color_type=0, first_frame_in_idat=False,
    )))
    df = (
        _local_rows(spark, rows, 1)
        .localCheckpoint(eager=False)
    )
    _APNG_CACHE[key] = df
    return df


def q235_apng(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated PNG under the VALUE gate (r12): RGBA source-blend,
    palette/tRNS OVER compositing with a dispose-background restore
    (the oracle replays the effective index per pixel per frame, the
    q215 media-9 discipline under APNG operations), and the
    hidden-default-image grayscale layout — through the production
    `decode_media`; the fractional-alpha clip adjudicates the
    metadata-only contract."""
    return (
        decode_media(_apng_corpus(spark))
        .select(
            "media_id", "width", "height", "n_frames", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


_MOVAU_CACHE: dict[str, DataFrame] = {}


@locked_frame_builder
def _mov_audio_corpus(spark: SparkSession) -> DataFrame:
    """QuickTime 'soun'-track clips whose demux is EXACT (r12): PCM
    sample bytes md5-expanded from '{i}:movau:{c}', muxed by
    `encode_mov_audio` into real sample tables. Clips: 4 = 'sowt'
    16-bit stereo split across multi-frame chunks (the (l+r)//2
    floor fold); 5 = 'twos' BIG-endian 16-bit mono; 6 = 'raw ' 8-bit
    offset binary; 7 = 'ima4' compressed — VALID-UNSUPPORTED, sample
    count with NULL moments."""
    import hashlib

    from dataingestiontohana_spark.operators.multimodal import (
        encode_mov_audio,
    )

    key = spark.sparkContext.applicationId
    df = _MOVAU_CACHE.get(key)
    if df is not None:
        return df
    _MOVAU_CACHE.clear()

    def expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:movau:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    rows = [
        (4, KIND_AUDIO, encode_mov_audio(
            expand(4, 400), b"sowt", 2, 16, frames_per_chunk=30)),
        (5, KIND_AUDIO, encode_mov_audio(
            expand(5, 200), b"twos", 1, 16)),
        (6, KIND_AUDIO, encode_mov_audio(
            expand(6, 200), b"raw ", 1, 8)),
        (7, KIND_AUDIO, encode_mov_audio(
            expand(7, 120), b"ima4", 1, 8)),
    ]
    df = (
        _local_rows(spark, rows, 1)
        .localCheckpoint(eager=False)
    )
    _MOVAU_CACHE[key] = df
    return df


def q234_mov_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuickTime sound-track demux under the VALUE gate (r12): the
    production audio operator dispatches the MOV clips through the
    sample-table walk — little-endian 'sowt' stereo (floor-of-mean
    fold), big-endian 'twos', 8-bit 'raw ' — and the oracle
    recomputes every decoded sample (and its exact moments) from the
    md5 expansion; the compressed 'ima4' clip adjudicates the
    count-only contract."""
    from dataingestiontohana_spark.operators.multimodal import (
        avi_audio_samples,
    )

    return (
        avi_audio_samples(_mov_audio_corpus(spark))
        .select("media_id", "codec", "n_samples", "px_sum", "px_sqsum")
        .orderBy("media_id")
    )


def q233_mov_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame SAMPLING on real MOV movies (r12): every_k=2
    through the production `sample_frames` operator — one row per
    kept frame with its exact byte-sum checksum, adjudicating the
    frame SLICES individually across the QuickTime container (q232
    gates the whole-clip aggregate); the metadata-only 'mjpa' movie
    contributes zero rows."""
    return (
        sample_frames(_mov_corpus(spark), every_k=2)
        .select("media_id", "frame_idx", "frame_px_sum")
        .orderBy("media_id", "frame_idx")
    )


def q232_mov_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuickTime/MOV MJPEG under the VALUE gate (r12): baseline,
    progressive (two-samples-per-chunk stsc layout), and gray-valued
    RGB movies decode through the production `decode_media` — every
    frame through the pinned JPEG decoder — with whole-clip moments
    recomputed by the oracle from the md5 block seeds; the 'mjpa'
    clip adjudicates the valid-unsupported contract (stsd dims + stsz
    count, NULL moments)."""
    return (
        decode_media(_mov_corpus(spark))
        .select(
            "media_id", "width", "height", "n_frames", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


_AVI_CACHE: dict[str, DataFrame] = {}
# (media_id, n_frames, channels) of the DECODING clips; clip 5 is the
# valid-unsupported XVID entry (metadata-only by contract)
_AVI_SPECS: tuple[tuple[int, int, int], ...] = (
    (0, 4, 1), (1, 3, 1), (2, 5, 1), (3, 4, 1), (4, 2, 3),
)


@locked_frame_builder
def _avi_corpus(spark: SparkSession) -> DataFrame:
    """REAL RIFF/AVI MJPEG clips whose decode is EXACT (r12 — video
    columns, the last major training-data modality): every frame is a
    constant-block md5 mosaic at unit quantization (the q204
    discipline — frame f of clip i takes its 6 block constants from
    md5('{i}:avi:{f}')), so the pinned JPEG decoder reproduces every
    pixel and the SQL oracle recomputes per-frame and whole-clip
    moments from the seed. The five decoding clips walk the frame
    codec surface: 0 = baseline; 1 = baseline + restart intervals
    with the movi chunks grouped under a 'rec ' list (the DV-writer
    interleave shape); 2 = progressive (full multi-scan script);
    3 = ARITHMETIC (QM coder, restart reinit per frame); 4 =
    gray-valued RGB baseline (Cb/Cr quantize to exactly 0 — the clip
    35/37 trick — so 3-channel moments are the gray formula x3).
    Clip 5 declares fourcc XVID over garbage frames: a VALID
    UNSUPPORTED codec, full header metadata + NULL moments, never
    quarantined."""
    import hashlib

    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_arith,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    key = spark.sparkContext.applicationId
    df = _AVI_CACHE.get(key)
    if df is not None:
        return df
    _AVI_CACHE.clear()
    ones = np.ones(64, dtype=np.int32)
    w, h = _JPEG_BW * 8, _JPEG_BH * 8

    def mosaic(mid: int, f: int) -> np.ndarray:
        consts = hashlib.md5(f"{mid}:avi:{f}".encode()).digest()[
            : _JPEG_BW * _JPEG_BH
        ]
        grid = np.zeros((h, w), dtype=np.uint8)
        for j, v in enumerate(consts):
            by, bx = divmod(j, _JPEG_BW)
            grid[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
        return grid.reshape(-1)

    import struct as _struct

    def audio_expand(mid: int, need: int) -> bytes:
        out = bytearray()
        c = 0
        while len(out) < need:
            out += hashlib.md5(f"{mid}:aviau:{c}".encode()).digest()
            c += 1
        return bytes(out[:need])

    # clip 0 carries an int16-mono PCM audio stream (512 md5 bytes =
    # 256 samples, split over TWO 01wb chunks — the demux must
    # concatenate), clip 6 an 8-bit STEREO stream (600 bytes = 300
    # frames, the (l+r)//2 fold) — r12, `avi_audio_samples`
    au16 = audio_expand(0, 512)
    audio0 = (
        _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16),
        [au16[:200], au16[200:]],
    )
    au8 = audio_expand(6, 600)
    audio6 = (
        _struct.pack("<HHIIHH", 1, 2, 8000, 16000, 2, 8),
        [au8],
    )
    rows = []
    for mid, nf, ch in _AVI_SPECS:
        frames = []
        for f in range(nf):
            px = mosaic(mid, f)
            if mid == 1:
                frames.append(encode_jpeg_baseline(
                    px, w, h, 1, quant_luma=ones, restart_interval=2))
            elif mid == 2:
                frames.append(encode_jpeg_progressive(
                    px, w, h, 1, quant_luma=ones))
            elif mid == 3:
                frames.append(encode_jpeg_arith(
                    px, w, h, 1, quant_luma=ones, restart_interval=2))
            elif ch == 3:
                frames.append(encode_jpeg_baseline(
                    np.repeat(px, 3), w, h, 3,
                    quant_luma=ones, quant_chroma=ones))
            else:
                frames.append(encode_jpeg_baseline(
                    px, w, h, 1, quant_luma=ones))
        rows.append((mid, KIND_VIDEO, encode_avi_mjpeg(
            frames, w, h, use_rec_list=(mid == 1),
            audio=audio0 if mid == 0 else None)))
    rows.append((5, KIND_VIDEO, encode_avi_mjpeg(
        [b"\x12\x34" * 8] * 3, w, h, handler=b"XVID")))
    # clip 6 (r12 second pass): RAW uncompressed BI_RGB frames — the
    # other dominant AVI layout; decode is byte-lossless, so every
    # pixel byte is the md5 expansion and the oracle recomputes the
    # moments directly (the clip-32 lossless argument).
    from dataingestiontohana_spark.operators.multimodal import (
        encode_avi_dib,
    )

    def dib_frame(f: int) -> np.ndarray:
        out = bytearray()
        c = 0
        while len(out) < w * h * 3:
            out += hashlib.md5(f"6:avidib:{f}:{c}".encode()).digest()
            c += 1
        return np.frombuffer(
            bytes(out[: w * h * 3]), np.uint8
        ).reshape(h, w, 3)

    rows.append((6, KIND_VIDEO, encode_avi_dib(
        [dib_frame(0), dib_frame(1)], w, h, topdown=True,
        audio=audio6)))
    # clip 7 (r12): the PLANTED NEAR-DUP of clip 6 — same frames with
    # +8 (mod 256) at every 37th byte position (the q82 probe
    # discipline), muxed bottom-up instead of top-down: the video
    # near-dup pair must survive both the pixel noise AND the
    # container layout change.
    def perturb(a: np.ndarray) -> np.ndarray:
        flat = a.reshape(-1).astype(np.int32)
        idx = np.arange(0, flat.size, 37)
        flat[idx] = (flat[idx] + 8) % 256
        return flat.astype(np.uint8).reshape(a.shape)

    rows.append((7, KIND_VIDEO, encode_avi_dib(
        [perturb(dib_frame(0)), perturb(dib_frame(1))], w, h)))
    df = (
        _local_rows(spark, rows, 2)
        .localCheckpoint(eager=False)
    )
    _AVI_CACHE[key] = df
    return df


def q225_avi_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG-in-AVI decode under the VALUE gate (r12): the whole
    container walk (hdrl/strl/movi/'rec ' grouping) + per-frame JPEG
    decode through the production `decode_media`; the oracle
    recomputes every clip's exact integer moments from the md5 seed,
    and the n_frames column adjudicates the movi chunk walk itself.
    Clip 5 (XVID) pins the valid-unsupported contract: header
    metadata with NULL moments."""
    return (
        decode_media(_avi_corpus(spark))
        .select(
            "media_id", "width", "height", "n_frames", "channels",
            "px_sum", "px_sqsum",
        )
        .orderBy("media_id")
    )


def q226_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame SAMPLING on real AVI clips (r12): every_k=2
    through the production `sample_frames` operator — one row per
    kept frame with its exact byte-sum checksum, so the oracle
    adjudicates the frame SLICES individually (q225 gates the
    whole-clip aggregate). The metadata-only XVID clip must
    contribute zero rows (the operator skips undecodable videos
    instead of crashing)."""
    return (
        sample_frames(_avi_corpus(spark), every_k=2)
        .select("media_id", "frame_idx", "frame_px_sum")
        .orderBy("media_id", "frame_idx")
    )


def q227_video_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame perceptual video fingerprints (r12): every decoding
    corpus clip through the production `video_dhash` — the frame-hash
    SEQUENCE a video-dedup pipeline keys on — with the oracle
    recomputing every 64-bit hash verbatim from the md5 seeds (luma
    gather + gradient bits + hex packing replayed in SQL for both the
    mosaic MJPEG clips and the raw-DIB pair). The metadata-only XVID
    clip contributes no rows."""
    return (
        video_dhash(_avi_corpus(spark))
        .orderBy("media_id", "frame_idx")
    )


def q228_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-level near-duplicate pairing (r12): clips whose frame
    hashes agree at a majority of aligned positions, through the
    production `video_neardup_pairs` — the planted pair (clip 7 =
    clip 6 + sparse pixel noise, muxed in the OTHER container layout)
    must surface. Mosaic-frame hashes are low-entropy by construction
    (6 constant blocks -> 4 informative bits), so accidental mosaic
    pairs are legitimate collisions the oracle replays exactly — the
    gate adjudicates the MECHANISM, not a curated answer."""
    return (
        video_neardup_pairs(_avi_corpus(spark))
        .orderBy("id_a", "id_b")
    )


def q229_avi_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVI audio demux under the VALUE gate (r12): the 'auds' streams
    planted in clips 0 (int16 mono, split across two 01wb chunks) and
    6 (8-bit stereo, (l+r)//2 fold) through the production
    `avi_audio_samples` — decoded via the SAME codec dispatch as WAV
    — with the oracle recomputing every sample (and its exact
    moments) from the md5 expansion. Audio-less clips contribute no
    rows."""
    return (
        avi_audio_samples(_avi_corpus(spark))
        .select("media_id", "codec", "n_samples", "px_sum", "px_sqsum")
        .orderBy("media_id")
    )


def q38b_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: sample count + exact integer sample
    moments per audio payload (rms/FFT-band floats stay on the
    operator, numpy-pinned in pytest — sums determine rms exactly:
    rms = sqrt(n*sqsum - sum^2) / (255*n))."""
    feats = audio_features(_synthetic_media(spark), n_bands=8)
    return feats.select(
        "media_id", "n_samples", "px_sum", "px_sqsum"
    ).orderBy("media_id")


# DuckDB reconstruction of the synthetic corpus built by
# `_synthetic_media`: 64 items, kind by media_id % 4, payload bytes
# md5-expanded from the ASCII seed "{media_id}:{kind}:{chunk}". A
# payload byte at offset pos is hex pair (pos%16) of chunk pos//16;
# hex digits decode via strpos on the hex alphabet. Videos need
# ceil(3072/16) = 192 chunks — the fixed range bound (DuckDB 1.0 range
# does not accept lateral correlation).
_MEDIA_BYTES_CTE = """
media AS (
  SELECT CAST(i AS BIGINT) AS media_id,
         CASE WHEN i%4=0 THEN 3 WHEN i%4=1 THEN 2 ELSE 1 END AS kind,
         CASE WHEN i%4=1 THEN 256 ELSE 32 END AS width,
         CASE WHEN i%4=1 THEN 1 ELSE 16 END AS height,
         CASE WHEN i%4=0 THEN 6 ELSE 1 END AS n_frames
  FROM range(64) t(i)
),
chunks AS (
  SELECT m.media_id, m.kind, m.width, m.height, m.n_frames,
         m.width*m.height*m.n_frames AS need,
         CAST(c.j AS INT) AS counter,
         md5(m.media_id || ':' || m.kind || ':' || c.j) AS h
  FROM media m, range(192) c(j)
  WHERE c.j*16 < m.width*m.height*m.n_frames
),
mbytes AS (
  SELECT media_id, kind, width, height, n_frames, need,
         counter*16 + CAST(g.j AS INT) AS pos,
         16*(strpos('0123456789abcdef', substr(h, CAST(2*g.j+1 AS INT), 1))-1)
           + (strpos('0123456789abcdef', substr(h, CAST(2*g.j+2 AS INT), 1))-1)
           AS b
  FROM chunks, range(16) g(j)
  WHERE counter*16 + g.j < need
)
"""


# dHash reconstruction: gather positions for the 32x16 -> 9x8 grid are
# row 2*(i//8) (so byte offset 64*(i//8)) and cols (x*32)//9; bit i
# compares col x+1 against col x; bits pack MSB-first into hex nibbles
# (nibble i//4, weight 8 >> (i%4)). pbytes = image bytes plus the
# perturbed probes (+8 mod 256 at every 37th payload position,
# media_id + 1000) — the planted near-dup set.
_DHASH_CTES = f"""
{_MEDIA_BYTES_CTE},
ib AS (
  SELECT media_id, pos, b FROM mbytes WHERE kind = 1
),
pbytes AS (
  SELECT media_id, pos, b FROM ib
  UNION ALL
  SELECT media_id + 1000, pos,
         CASE WHEN pos % 37 = 0 THEN (b + 8) % 256 ELSE b END
  FROM ib
),
dbits AS (
  SELECT m.media_id, CAST(g.i AS INT) AS i,
         CASE WHEN b1.b > b0.b THEN 1 ELSE 0 END AS bit
  FROM (SELECT DISTINCT media_id FROM pbytes) m
  CROSS JOIN range(64) g(i)
  JOIN pbytes b0 ON b0.media_id = m.media_id
       AND b0.pos = 64*(g.i//8) + ((g.i%8)*32)//9
  JOIN pbytes b1 ON b1.media_id = m.media_id
       AND b1.pos = 64*(g.i//8) + (((g.i%8)+1)*32)//9
),
nibs AS (
  SELECT media_id, i//4 AS nib,
         SUM(bit * (CASE i%4 WHEN 0 THEN 8 WHEN 1 THEN 4
                             WHEN 2 THEN 2 ELSE 1 END)) AS nv
  FROM dbits GROUP BY media_id, i//4
),
hashes AS (
  SELECT media_id,
         string_agg(substr('0123456789abcdef', CAST(nv AS INT) + 1, 1),
                    '' ORDER BY nib) AS dhash
  FROM nibs GROUP BY media_id
)
"""


# Audio-fingerprint reconstruction: block energies over the md5
# audio bytes (kind=2, 256 samples -> 32 blocks of 8), dHash-style
# energy-gradient bits packed MSB-first into hex. apbytes = clip
# bytes plus the click-noise probes (+4 mod 256 at every 29th sample,
# media_id + 2000) — the planted near-dup set.
_AHASH_CTES = f"""
{_MEDIA_BYTES_CTE},
ab AS (
  SELECT media_id, pos, b FROM mbytes WHERE kind = 2
),
apbytes AS (
  SELECT media_id, pos, b FROM ab
  UNION ALL
  SELECT media_id + 2000, pos,
         CASE WHEN pos % 29 = 0 THEN (b + 4) % 256 ELSE b END
  FROM ab
),
energies AS (
  SELECT media_id, pos // 8 AS blk, SUM(b * b) AS e
  FROM apbytes GROUP BY media_id, pos // 8
),
abits AS (
  SELECT a.media_id, CAST(a.blk AS INT) AS i,
         CASE WHEN a.e > n.e THEN 1 ELSE 0 END AS bit
  FROM energies a
  JOIN energies n ON n.media_id = a.media_id
                 AND n.blk = (a.blk + 1) % 32
),
anibs AS (
  SELECT media_id, i // 4 AS nib,
         SUM(bit * (CASE i % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                               WHEN 2 THEN 2 ELSE 1 END)) AS nv
  FROM abits GROUP BY media_id, i // 4
),
ahashes AS (
  SELECT media_id,
         string_agg(substr('0123456789abcdef', CAST(nv AS INT) + 1, 1),
                    '' ORDER BY nib) AS ahash
  FROM anibs GROUP BY media_id
)
"""


# DuckDB reconstruction of the color-PNG corpus (see _png_color_corpus):
# the encode->decode round trip cancels, so the oracle recomputes the
# DECODED channel bytes straight from the md5 expansion. raw_ch = bytes
# of raw payload per pixel (3 RGB / 4 RGBA / 1 palette index); palette
# rows expand 1 index byte -> 3 closed-form palette bytes.
_PNG_COLOR_CTE = """
png_media AS (
  SELECT CAST(i AS BIGINT) AS media_id,
         CASE i%3 WHEN 0 THEN 2 WHEN 1 THEN 6 ELSE 3 END AS color_type,
         CASE i%3 WHEN 0 THEN 3 WHEN 1 THEN 4 ELSE 1 END AS raw_ch
  FROM range(36) t(i)
),
png_chunks AS (
  SELECT m.media_id, m.color_type, 128*m.raw_ch AS need,
         CAST(c.j AS INT) AS counter,
         md5(m.media_id || ':png:' || c.j) AS h
  FROM png_media m, range(32) c(j)
  WHERE c.j*16 < 128*m.raw_ch
),
png_raw AS (
  SELECT media_id, color_type,
         16*(strpos('0123456789abcdef', substr(h, CAST(2*g.j+1 AS INT), 1))-1)
           + (strpos('0123456789abcdef', substr(h, CAST(2*g.j+2 AS INT), 1))-1)
           AS b
  FROM png_chunks, range(16) g(j)
  WHERE counter*16 + g.j < need
),
png_px AS (
  SELECT media_id, color_type, b FROM png_raw WHERE color_type IN (2, 6)
  UNION ALL
  SELECT media_id, color_type, ((b%64)*37)%256 FROM png_raw WHERE color_type=3
  UNION ALL
  SELECT media_id, color_type, ((b%64)*59)%256 FROM png_raw WHERE color_type=3
  UNION ALL
  SELECT media_id, color_type, ((b%64)*83)%256 FROM png_raw WHERE color_type=3
),
pngt_media AS (
  SELECT CAST(i AS BIGINT) AS media_id, CAST(i % 3 AS INT) AS form
  FROM range(36, 42) t(i)
),
pngt_bytes AS (
  SELECT m.media_id, m.form,
         c.j*16 + CAST(g.j AS INT) AS pos,
         16*(strpos('0123456789abcdef',
              substr(md5(m.media_id || ':png:' || c.j),
                     CAST(2*g.j+1 AS INT), 1))-1)
           + (strpos('0123456789abcdef',
              substr(md5(m.media_id || ':png:' || c.j),
                     CAST(2*g.j+2 AS INT), 1))-1) AS b
  FROM pngt_media m, range(8) c(j), range(16) g(j)
),
pngt_keys AS (
  SELECT media_id, b AS k0 FROM pngt_bytes WHERE pos = 0
),
-- decoded sample streams per tRNS form: palette expands RGB + the
-- planted per-entry alpha ((idx*29)%256); gray/rgb emit the samples
-- plus alpha = 0 where the sample equals the image's own first byte
pngt_px AS (
  SELECT t.media_id, 4 AS channels, ((b%64)*37)%256 AS v
  FROM pngt_bytes t WHERE form = 0
  UNION ALL
  SELECT t.media_id, 4, ((b%64)*59)%256 FROM pngt_bytes t WHERE form = 0
  UNION ALL
  SELECT t.media_id, 4, ((b%64)*83)%256 FROM pngt_bytes t WHERE form = 0
  UNION ALL
  SELECT t.media_id, 4, ((b%64)*29)%256 FROM pngt_bytes t WHERE form = 0
  UNION ALL
  SELECT t.media_id, 2, b FROM pngt_bytes t WHERE form = 1
  UNION ALL
  SELECT t.media_id, 2, CASE WHEN b = k.k0 THEN 0 ELSE 255 END
  FROM pngt_bytes t JOIN pngt_keys k USING (media_id) WHERE form = 1
  UNION ALL
  SELECT t.media_id, 4, b FROM pngt_bytes t, range(3) r(n) WHERE form = 2
  UNION ALL
  SELECT t.media_id, 4, CASE WHEN b = k.k0 THEN 0 ELSE 255 END
  FROM pngt_bytes t JOIN pngt_keys k USING (media_id) WHERE form = 2
)
"""


# DuckDB reconstruction of the native-WAV corpus (see
# _wav_native_corpus): bytes from the md5 expansion; little-endian
# byte weights assemble each unsigned sample; two's-complement sign
# correction; stereo folds (l+r) with FLOOR division (DuckDB // is
# truncate-toward-zero — floor() over an exact float64 sum instead,
# |l+r| <= 2^32 << 2^53); moments in HUGEINT, split hi/lo at 10^18.
_WAV_NATIVE_CTE = f"""
wav_media AS (
  SELECT CAST(i AS BIGINT) AS media_id,
         CASE i%4 WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 24 ELSE 32 END
           AS bits,
         CASE WHEN i%4 = 0 THEN 1 ELSE 1 + (i//4)%2 END AS channels
  FROM range(16) t(i)
  UNION ALL
  -- >2-channel integer clips (r9): 8/16/24/32 bits x 4/4/3/6 channels
  SELECT CAST(i AS BIGINT),
         CASE i WHEN 24 THEN 8 WHEN 25 THEN 16 WHEN 26 THEN 24
                ELSE 32 END,
         CASE i WHEN 24 THEN 4 WHEN 25 THEN 4 WHEN 26 THEN 3
                ELSE 6 END
  FROM range(24, 28) t(i)
  UNION ALL
  -- WAVE_FORMAT_EXTENSIBLE clip 39 (r12): 16-bit stereo PCM behind
  -- the SubFormat GUID remap — same sample bytes as the classic clips
  SELECT CAST(39 AS BIGINT), 16, 2
),
wav_chunks AS (
  SELECT m.media_id, m.bits, m.channels,
         {_WAV_FRAMES}*(m.bits//8)*m.channels AS need,
         CAST(c.j AS INT) AS counter,
         md5(m.media_id || ':wav:' || c.j) AS h
  FROM wav_media m, range(96) c(j)
  WHERE c.j*16 < {_WAV_FRAMES}*(m.bits//8)*m.channels
),
wav_bytes AS (
  SELECT media_id, bits, channels, need,
         counter*16 + CAST(g.j AS INT) AS pos,
         16*(strpos('0123456789abcdef', substr(h, CAST(2*g.j+1 AS INT), 1))-1)
           + (strpos('0123456789abcdef', substr(h, CAST(2*g.j+2 AS INT), 1))-1)
           AS b
  FROM wav_chunks, range(16) g(j)
  WHERE counter*16 + g.j < need
),
wav_unsigned AS (
  SELECT media_id, bits, channels, pos // (bits//8) AS s,
         SUM(b * (CASE pos % (bits//8) WHEN 0 THEN 1 WHEN 1 THEN 256
                       WHEN 2 THEN 65536 ELSE 16777216 END)) AS uv
  FROM wav_bytes
  GROUP BY media_id, bits, channels, pos // (bits//8)
),
wav_signed AS (
  SELECT media_id, bits, channels, s,
         CASE WHEN bits = 8 THEN uv
              WHEN bits = 16 AND uv >= 32768 THEN uv - 65536
              WHEN bits = 24 AND uv >= 8388608 THEN uv - 16777216
              WHEN bits = 32 AND uv >= 2147483648 THEN uv - 4294967296
              ELSE uv END AS v
  FROM wav_unsigned
),
wav_folded AS (
  SELECT media_id, bits, s // channels AS frame,
         CASE WHEN channels > 1
              THEN CAST(floor(SUM(v) / CAST(channels AS DOUBLE))
                   AS BIGINT)
              ELSE CAST(SUM(v) AS BIGINT) END AS v
  FROM wav_signed
  GROUP BY media_id, bits, channels, s // channels
),
wavf_media AS (
  SELECT CAST(i AS BIGINT) AS media_id,
         CASE WHEN i >= 18 THEN 64 ELSE 32 END AS bits,
         CASE WHEN i >= 18 THEN 7 ELSE 4 END AS stride,
         CASE WHEN i >= 18 THEN 51 ELSE 23 END AS g,
         1 + i % 2 AS channels
  FROM range(16, 20) t(i)
  UNION ALL
  -- 4-channel float clips (r9): k multiples of 4 -> exact 4-way fold
  SELECT CAST(i AS BIGINT),
         CASE WHEN i = 29 THEN 64 ELSE 32 END,
         CASE WHEN i = 29 THEN 7 ELSE 4 END,
         CASE WHEN i = 29 THEN 51 ELSE 23 END,
         4
  FROM range(28, 30) t(i)
  UNION ALL
  -- WAVE_FORMAT_EXTENSIBLE clip 40 (r12): 32-bit float mono behind
  -- the SubFormat GUID remap — the clip-16 grid math verbatim
  SELECT CAST(40 AS BIGINT), 32, 4, 23, 1
),
wavf_chunks AS (
  SELECT m.media_id, m.bits, m.stride, m.g, m.channels,
         {_WAV_FRAMES} * m.stride * m.channels AS need,
         CAST(c.j AS INT) AS counter,
         md5(m.media_id || ':wav:' || c.j) AS h
  FROM wavf_media m, range(112) c(j)
  WHERE c.j*16 < {_WAV_FRAMES} * m.stride * m.channels
),
wavf_bytes AS (
  SELECT media_id, bits, stride, g, channels, need,
         counter*16 + CAST(k.j AS INT) AS pos,
         16*(strpos('0123456789abcdef', substr(h, CAST(2*k.j+1 AS INT), 1))-1)
           + (strpos('0123456789abcdef', substr(h, CAST(2*k.j+2 AS INT), 1))-1)
           AS b
  FROM wavf_chunks, range(16) k(j)
  WHERE counter*16 + k.j < need
),
-- little-endian u from `stride` bytes: place value 2^(8*offset),
-- max byte place 2^48 at stride 7 so the SUM stays inside BIGINT
wavf_unsigned AS (
  SELECT media_id, bits, g, channels, pos // stride AS s,
         SUM(b * (CASE pos % stride
                       WHEN 0 THEN 1 WHEN 1 THEN 256 WHEN 2 THEN 65536
                       WHEN 3 THEN 16777216 WHEN 4 THEN 4294967296
                       WHEN 5 THEN 1099511627776
                       ELSE 281474976710656 END)) AS u
  FROM wavf_bytes
  GROUP BY media_id, bits, g, channels, pos // stride
),
-- the planted grid integers: mono k = (u mod 2^(g+1)) - 2^g;
-- stereo k = 2*((u mod 2^g) - 2^(g-1)) (even, so the mid-channel
-- fold (k_l + k_r)/2 stays an exact grid integer on both engines).
-- Powers written as BIGINT literals: DuckDB's ** returns DOUBLE and
-- u reaches 2^56, past the 53-bit mantissa.
wavf_grid AS (
  SELECT media_id, bits, channels, s,
         CASE WHEN channels = 1 AND g = 23
                THEN (u % 16777216) - 8388608
              WHEN channels = 1
                THEN (u % 4503599627370496) - 2251799813685248
              WHEN channels = 4 AND g = 23
                THEN 4 * ((u % 4194304) - 2097152)
              WHEN channels = 4
                THEN 4 * ((u % 1125899906842624) - 562949953421312)
              WHEN g = 23
                THEN 2 * ((u % 8388608) - 4194304)
              ELSE 2 * ((u % 2251799813685248) - 1125899906842624)
              END AS k
  FROM wavf_unsigned
),
wavf_folded AS (
  -- SUM(k) is divisible by the channel count by construction
  -- (stereo plants even k, 4-channel plants multiples of 4), so
  -- integer // is exact (truncate == floor == true division)
  SELECT media_id, bits, s // channels AS frame,
         CASE WHEN channels > 1 THEN SUM(k) // channels
              ELSE SUM(k) END AS v
  FROM wavf_grid
  GROUP BY media_id, bits, channels, s // channels
)
"""

# DuckDB replay of the IMA-ADPCM decode (clips 20-23, see
# _wav_native_corpus): the state machine (predictor + step index per
# nibble) is a sequential recurrence, so the oracle walks it with a
# RECURSIVE CTE — one row per (clip, block) advancing nibble position
# p and carrying the running sample sum / sum of squares. The nibble
# at position p is extracted from the same md5 expansion the corpus
# planted ("{id}:adpcm:{chunk}", low nibble first), and the
# step/index tables are the published IMA spec constants. Every
# decoded sample therefore feeds the adjudicated moments — a one-bit
# divergence anywhere in the 514-step walk hash-mismatches.
_ADPCM_NIBBLE_BYTE = (
    "16*(strpos('0123456789abcdef',"
    " substr(md5(media_id || ':adpcm:'"
    " || ((blk*128 + (p+1)//2) // 16)),"
    " CAST(2*((blk*128 + (p+1)//2) % 16) + 1 AS INT), 1))-1)"
    " + (strpos('0123456789abcdef',"
    " substr(md5(media_id || ':adpcm:'"
    " || ((blk*128 + (p+1)//2) // 16)),"
    " CAST(2*((blk*128 + (p+1)//2) % 16) + 2 AS INT), 1))-1)"
)

_ADPCM2_NIBBLE_BYTE = (
    "16*(strpos('0123456789abcdef', substr(md5(media_id || ':adpcm2:' || ((blk*64 + ((p+1)//8)*8 + ch*4 + ((p+1)%8)//2) // 16)), CAST(2*((blk*64 + ((p+1)//8)*8 + ch*4 + ((p+1)%8)//2) % 16) + 1 AS INT), 1))-1) + (strpos('0123456789abcdef', substr(md5(media_id || ':adpcm2:' || ((blk*64 + ((p+1)//8)*8 + ch*4 + ((p+1)%8)//2) // 16)), CAST(2*((blk*64 + ((p+1)//8)*8 + ch*4 + ((p+1)%8)//2) % 16) + 2 AS INT), 1))-1)"
)

# 3-channel (r10): body groups are 12 bytes (three 4-byte channel
# slices), block body 48 bytes, seed ':adpcm3:'
_ADPCM3_NIBBLE_BYTE = (
    "16*(strpos('0123456789abcdef', substr(md5(media_id || ':adpcm3:' || ((blk*48 + ((p+1)//8)*12 + ch*4 + ((p+1)%8)//2) // 16)), CAST(2*((blk*48 + ((p+1)//8)*12 + ch*4 + ((p+1)%8)//2) % 16) + 1 AS INT), 1))-1) + (strpos('0123456789abcdef', substr(md5(media_id || ':adpcm3:' || ((blk*48 + ((p+1)//8)*12 + ch*4 + ((p+1)%8)//2) // 16)), CAST(2*((blk*48 + ((p+1)//8)*12 + ch*4 + ((p+1)%8)//2) % 16) + 2 AS INT), 1))-1)"
)

_ADPCM_CTE = f"""
ad_step_tab(i, step) AS (VALUES {", ".join(
    f"({i}, {s})" for i, s in enumerate(_IMA_STEP_TABLE))}),
ad_blocks AS (
  SELECT CAST(i AS BIGINT) AS media_id, CAST(b.j AS INT) AS blk,
         ((i*8191 + b.j*2713) % 65536) - 32768 AS pred0,
         (i*31 + b.j*17) % 89 AS idx0,
         255 AS nmax
  FROM range(20, 24) t(i), range({_ADPCM_BLOCKS}) b(j)
  UNION ALL
  -- clip 32 (r10): partial final block — 60 nibble bytes = 120
  -- nibbles, so the walk stops at p = 119 for blk 2
  SELECT 32, CAST(b.j AS INT),
         ((32*8191 + b.j*2713) % 65536) - 32768,
         (32*31 + b.j*17) % 89,
         CASE WHEN b.j = 2 THEN 119 ELSE 255 END
  FROM range(3) b(j)
),
ad_walk(media_id, blk, p, pred, idx, s, sq, nmax) AS (
  SELECT media_id, blk, -1, pred0, idx0,
         CAST(pred0 AS HUGEINT), CAST(pred0 AS HUGEINT) * pred0, nmax
  FROM ad_blocks
  UNION ALL
  SELECT media_id, blk, p, predn, idxn,
         s + predn, sq + CAST(predn AS HUGEINT) * predn, nmax
  FROM (
    SELECT media_id, blk, p, s, sq, nmax,
           GREATEST(-32768, LEAST(32767,
             CASE WHEN nib >= 8 THEN pred - diff
                  ELSE pred + diff END)) AS predn,
           LEAST(88, GREATEST(0, idx
             + CASE WHEN nib % 8 < 4 THEN -1
                    ELSE (nib % 8) * 2 - 6 END)) AS idxn
    FROM (
      SELECT media_id, blk, p, pred, idx, s, sq, nmax, nib,
             (step // 8) + (nib % 2) * (step // 4)
               + ((nib // 2) % 2) * (step // 2)
               + ((nib // 4) % 2) * step AS diff
      FROM (
        SELECT y.media_id, y.blk, y.p + 1 AS p, y.pred, y.idx,
               y.s, y.sq, y.nmax, st.step,
               CASE WHEN (y.p + 1) % 2 = 0 THEN y.byte % 16
                    ELSE y.byte // 16 END AS nib
        FROM (
          SELECT media_id, blk, p, pred, idx, s, sq, nmax,
                 {_ADPCM_NIBBLE_BYTE} AS byte
          FROM ad_walk WHERE p < nmax
        ) y JOIN ad_step_tab st ON st.i = y.idx
      ) x
    ) w
  ) v
),
ad2_blocks AS (
  SELECT CAST(i AS BIGINT) AS media_id, CAST(b.j AS INT) AS blk,
         CAST(c.j AS INT) AS ch,
         ((i*8191 + b.j*2713 + c.j*977) % 65536) - 32768 AS pred0,
         (i*31 + b.j*17 + c.j*5) % 89 AS idx0,
         63 AS nmax
  FROM range(30, 32) t(i), range({_ADPCM_BLOCKS}) b(j), range(2) c(j)
  UNION ALL
  -- clip 33 (r10): stereo partial final block — 32 body bytes =
  -- four whole channel-interleaved groups = 32 nibbles/channel
  SELECT 33, CAST(b.j AS INT), CAST(c.j AS INT),
         ((33*8191 + b.j*2713 + c.j*977) % 65536) - 32768,
         (33*31 + b.j*17 + c.j*5) % 89,
         CASE WHEN b.j = 1 THEN 31 ELSE 63 END
  FROM range(2) b(j), range(2) c(j)
),
ad2_walk(media_id, blk, ch, p, pred, idx, nmax) AS (
  SELECT media_id, blk, ch, -1, pred0, idx0, nmax FROM ad2_blocks
  UNION ALL
  SELECT media_id, blk, ch, p, predn, idxn, nmax
  FROM (
    SELECT media_id, blk, ch, p, nmax,
           GREATEST(-32768, LEAST(32767,
             CASE WHEN nib >= 8 THEN pred - diff
                  ELSE pred + diff END)) AS predn,
           LEAST(88, GREATEST(0, idx
             + CASE WHEN nib % 8 < 4 THEN -1
                    ELSE (nib % 8) * 2 - 6 END)) AS idxn
    FROM (
      SELECT media_id, blk, ch, p, pred, idx, nmax, nib,
             (step // 8) + (nib % 2) * (step // 4)
               + ((nib // 2) % 2) * (step // 2)
               + ((nib // 4) % 2) * step AS diff
      FROM (
        SELECT y.media_id, y.blk, y.ch, y.p + 1 AS p, y.pred, y.idx,
               y.nmax, st.step,
               CASE WHEN (y.p + 1) % 2 = 0 THEN y.byte % 16
                    ELSE y.byte // 16 END AS nib
        FROM (
          SELECT media_id, blk, ch, p, pred, idx, nmax,
                 {_ADPCM2_NIBBLE_BYTE} AS byte
          FROM ad2_walk WHERE p < nmax
        ) y JOIN ad_step_tab st ON st.i = y.idx
      ) x
    ) w
  ) v
),
ad2_frames AS (
  SELECT l.media_id,
         CAST(floor((l.pred + r.pred) / 2.0) AS BIGINT) AS v
  FROM ad2_walk l JOIN ad2_walk r
    ON l.media_id = r.media_id AND l.blk = r.blk AND l.p = r.p
   AND l.ch = 0 AND r.ch = 1
),
-- 3-channel clip 36 (r10): three independent walks per block,
-- folded floor-of-mean per sample index
ad3_blocks AS (
  SELECT CAST(36 AS BIGINT) AS media_id, CAST(b.j AS INT) AS blk,
         CAST(c.j AS INT) AS ch,
         ((36*8191 + b.j*2713 + c.j*977) % 65536) - 32768 AS pred0,
         (36*31 + b.j*17 + c.j*5) % 89 AS idx0,
         31 AS nmax
  FROM range(2) b(j), range(3) c(j)
),
ad3_walk(media_id, blk, ch, p, pred, idx, nmax) AS (
  SELECT media_id, blk, ch, -1, pred0, idx0, nmax FROM ad3_blocks
  UNION ALL
  SELECT media_id, blk, ch, p, predn, idxn, nmax
  FROM (
    SELECT media_id, blk, ch, p, nmax,
           GREATEST(-32768, LEAST(32767,
             CASE WHEN nib >= 8 THEN pred - diff
                  ELSE pred + diff END)) AS predn,
           LEAST(88, GREATEST(0, idx
             + CASE WHEN nib % 8 < 4 THEN -1
                    ELSE (nib % 8) * 2 - 6 END)) AS idxn
    FROM (
      SELECT media_id, blk, ch, p, pred, idx, nmax, nib,
             (step // 8) + (nib % 2) * (step // 4)
               + ((nib // 2) % 2) * (step // 2)
               + ((nib // 4) % 2) * step AS diff
      FROM (
        SELECT y.media_id, y.blk, y.ch, y.p + 1 AS p, y.pred, y.idx,
               y.nmax, st.step,
               CASE WHEN (y.p + 1) % 2 = 0 THEN y.byte % 16
                    ELSE y.byte // 16 END AS nib
        FROM (
          SELECT media_id, blk, ch, p, pred, idx, nmax,
                 {_ADPCM3_NIBBLE_BYTE} AS byte
          FROM ad3_walk WHERE p < nmax
        ) y JOIN ad_step_tab st ON st.i = y.idx
      ) x
    ) w
  ) v
),
ad3_frames AS (
  SELECT media_id, CAST(floor(SUM(pred) / 3.0) AS BIGINT) AS v
  FROM ad3_walk
  GROUP BY media_id, blk, p
),
-- G.711 clips 34-35 (r10): the segment decode replayed as SQL
-- arithmetic. mu-law: u = 255-b (one's complement), magnitude
-- t = ((mant<<3)+132)<<seg around bias 132, sign bit -> 132-t;
-- A-law: a = b XOR 0x55, t = (mant<<4)+8 / +264<<(seg-1), sign
-- bit -> +t. Pinned against audioop in pytest on the engine side.
g711_bytes AS (
  SELECT CAST(m.i AS BIGINT) AS media_id, m.tag, m.ch,
         c.j*16 + g.j AS pos,
         16*(strpos('0123456789abcdef',
              substr(md5(m.i || ':wav:' || c.j),
                     CAST(2*g.j+1 AS INT), 1))-1)
           + (strpos('0123456789abcdef',
              substr(md5(m.i || ':wav:' || c.j),
                     CAST(2*g.j+2 AS INT), 1))-1) AS b
  FROM (VALUES (34, 7, 1), (35, 6, 2)) m(i, tag, ch),
       range(8) c(j), range(16) g(j)
  WHERE c.j*16 + g.j < {_WAV_FRAMES} * m.ch
),
g711_dec AS (
  SELECT media_id, ch, pos,
         CASE WHEN tag = 7 THEN
           CASE WHEN (255 - b) >= 128
                THEN 132 - ((((255-b) % 16) * 8 + 132)
                            * (1 << (((255-b) // 16) % 8)))
                ELSE ((((255-b) % 16) * 8 + 132)
                      * (1 << (((255-b) // 16) % 8))) - 132 END
         ELSE
           CASE WHEN xor(b, 85) >= 128 THEN 1 ELSE -1 END *
           CASE (xor(b, 85) // 16) % 8
             WHEN 0 THEN (xor(b, 85) % 16) * 16 + 8
             WHEN 1 THEN (xor(b, 85) % 16) * 16 + 264
             ELSE ((xor(b, 85) % 16) * 16 + 264)
                  * (1 << ((xor(b, 85) // 16) % 8 - 1)) END
         END AS v
  FROM g711_bytes
),
g711_folded AS (
  SELECT media_id, CAST(floor(SUM(v) / (ch * 1.0)) AS BIGINT) AS v
  FROM g711_dec
  GROUP BY media_id, ch, pos // ch
)
"""


# DuckDB replay of the MS-ADPCM decode (clips 37-38, r11, see
# _wav_native_corpus): the coefficient-pair predictor
# trunc((s1*c1 + s2*c2)/256) + signed_nibble*idelta with
# idelta = max(16, adapt[nibble]*idelta/256) is a sequential
# recurrence like IMA, walked as a RECURSIVE CTE. The reference
# arithmetic is C division (truncation toward zero) — DuckDB's `//`
# matches exactly, which is WHY the replay uses `//` here while the
# floor-semantics folds use floor(). Nibbles are HIGH-first (the
# opposite of IMA); stereo walks BOTH channel state machines in one
# row per frame (each body byte is one frame: ch0 high, ch1 low) and
# folds floor-of-mean. idelta is unbounded above per the spec, so the
# walk carries it as HUGEINT.
_MS1_BYTE = (
    "16*(strpos('0123456789abcdef',"
    " substr(md5(media_id || ':msadpcm:'"
    " || ((blk*64 + (p+1)//2) // 16)),"
    " CAST(2*((blk*64 + (p+1)//2) % 16) + 1 AS INT), 1))-1)"
    " + (strpos('0123456789abcdef',"
    " substr(md5(media_id || ':msadpcm:'"
    " || ((blk*64 + (p+1)//2) // 16)),"
    " CAST(2*((blk*64 + (p+1)//2) % 16) + 2 AS INT), 1))-1)"
)
_MS2_BYTE = (
    "16*(strpos('0123456789abcdef',"
    " substr(md5(media_id || ':msadpcm:'"
    " || ((blk*64 + p+1) // 16)),"
    " CAST(2*((blk*64 + p+1) % 16) + 1 AS INT), 1))-1)"
    " + (strpos('0123456789abcdef',"
    " substr(md5(media_id || ':msadpcm:'"
    " || ((blk*64 + p+1) // 16)),"
    " CAST(2*((blk*64 + p+1) % 16) + 2 AS INT), 1))-1)"
)

_MSADPCM_CTE = f"""
ms_coef(ci, c1, c2) AS (VALUES
  (0, 256, 0), (1, 512, -256), (2, 0, 0), (3, 192, 64),
  (4, 240, 0), (5, 460, -208), (6, 392, -232)),
ms_adapt(ni, av) AS (VALUES
  (0, 230), (1, 230), (2, 230), (3, 230), (4, 307), (5, 409),
  (6, 512), (7, 614), (8, 768), (9, 614), (10, 512), (11, 409),
  (12, 307), (13, 230), (14, 230), (15, 230)),
ms1_blocks AS (
  SELECT CAST(37 AS BIGINT) AS media_id, CAST(b.j AS INT) AS blk,
         (37*7 + b.j*3) % 7 AS ci,
         CAST(16 + (37*97 + b.j*53) % 4000 AS HUGEINT) AS d0,
         ((37*8191 + b.j*2713) % 65536) - 32768 AS s1_0,
         ((37*4099 + b.j*1511) % 65536) - 32768 AS s2_0,
         127 AS nmax
  FROM range(2) b(j)
),
ms1_walk(media_id, blk, p, s1, s2, d, ci, s, sq, nmax) AS (
  SELECT media_id, blk, -1, s1_0, s2_0, d0, ci,
         CAST(s1_0 AS HUGEINT) + s2_0,
         CAST(s1_0 AS HUGEINT)*s1_0 + CAST(s2_0 AS HUGEINT)*s2_0,
         nmax
  FROM ms1_blocks
  UNION ALL
  SELECT media_id, blk, p, predn, s1, dn, ci, s + predn,
         sq + CAST(predn AS HUGEINT)*predn, nmax
  FROM (
    SELECT x.media_id, x.blk, x.p, x.s1, x.ci, x.nmax, x.s, x.sq,
           GREATEST(-32768, LEAST(32767,
             (x.s1*c.c1 + x.s2*c.c2) // 256
             + (CASE WHEN x.nib >= 8 THEN x.nib - 16
                     ELSE x.nib END) * x.d)) AS predn,
           GREATEST(CAST(16 AS HUGEINT), (a.av * x.d) // 256) AS dn
    FROM (
      SELECT y.media_id, y.blk, y.p + 1 AS p, y.s1, y.s2, y.d,
             y.ci, y.s, y.sq, y.nmax,
             CASE WHEN (y.p + 1) % 2 = 0 THEN y.byte // 16
                  ELSE y.byte % 16 END AS nib
      FROM (
        SELECT media_id, blk, p, s1, s2, d, ci, s, sq, nmax,
               {_MS1_BYTE} AS byte
        FROM ms1_walk WHERE p < nmax
      ) y
    ) x JOIN ms_coef c ON c.ci = x.ci JOIN ms_adapt a ON a.ni = x.nib
  ) w
),
ms2_blocks AS (
  SELECT CAST(38 AS BIGINT) AS media_id, CAST(b.j AS INT) AS blk,
         (38*7 + b.j*3) % 7 AS cil, (38*7 + b.j*3 + 1) % 7 AS cir,
         CAST(16 + (38*97 + b.j*53) % 4000 AS HUGEINT) AS dl0,
         CAST(16 + (38*97 + b.j*53 + 29) % 4000 AS HUGEINT) AS dr0,
         ((38*8191 + b.j*2713) % 65536) - 32768 AS s1l0,
         ((38*8191 + b.j*2713 + 977) % 65536) - 32768 AS s1r0,
         ((38*4099 + b.j*1511) % 65536) - 32768 AS s2l0,
         ((38*4099 + b.j*1511 + 641) % 65536) - 32768 AS s2r0,
         CASE WHEN b.j = 1 THEN 31 ELSE 63 END AS nmax
  FROM range(2) b(j)
),
ms2_walk(media_id, blk, p, s1l, s2l, dl, cil,
         s1r, s2r, dr, cir, s, sq, nmax) AS (
  SELECT media_id, blk, -1, s1l0, s2l0, dl0, cil,
         s1r0, s2r0, dr0, cir,
         CAST(floor((s2l0 + s2r0)/2.0) AS HUGEINT)
           + CAST(floor((s1l0 + s1r0)/2.0) AS HUGEINT),
         CAST(floor((s2l0 + s2r0)/2.0) AS HUGEINT)
           * CAST(floor((s2l0 + s2r0)/2.0) AS HUGEINT)
           + CAST(floor((s1l0 + s1r0)/2.0) AS HUGEINT)
           * CAST(floor((s1l0 + s1r0)/2.0) AS HUGEINT),
         nmax
  FROM ms2_blocks
  UNION ALL
  SELECT media_id, blk, p, pl, s1l, dln, cil, pr, s1r, drn, cir,
         s + CAST(floor((pl + pr)/2.0) AS HUGEINT),
         sq + CAST(floor((pl + pr)/2.0) AS HUGEINT)
            * CAST(floor((pl + pr)/2.0) AS HUGEINT),
         nmax
  FROM (
    SELECT x.media_id, x.blk, x.p, x.s1l, x.s1r, x.cil, x.cir,
           x.nmax, x.s, x.sq,
           GREATEST(-32768, LEAST(32767,
             (x.s1l*cl.c1 + x.s2l*cl.c2) // 256
             + (CASE WHEN x.nl >= 8 THEN x.nl - 16
                     ELSE x.nl END) * x.dl)) AS pl,
           GREATEST(CAST(16 AS HUGEINT), (al.av * x.dl) // 256) AS dln,
           GREATEST(-32768, LEAST(32767,
             (x.s1r*cr.c1 + x.s2r*cr.c2) // 256
             + (CASE WHEN x.nr >= 8 THEN x.nr - 16
                     ELSE x.nr END) * x.dr)) AS pr,
           GREATEST(CAST(16 AS HUGEINT), (ar.av * x.dr) // 256) AS drn
    FROM (
      SELECT y.media_id, y.blk, y.p + 1 AS p,
             y.s1l, y.s2l, y.dl, y.cil,
             y.s1r, y.s2r, y.dr, y.cir, y.s, y.sq, y.nmax,
             y.byte // 16 AS nl, y.byte % 16 AS nr
      FROM (
        SELECT media_id, blk, p, s1l, s2l, dl, cil,
               s1r, s2r, dr, cir, s, sq, nmax,
               {_MS2_BYTE} AS byte
        FROM ms2_walk WHERE p < nmax
      ) y
    ) x
    JOIN ms_coef cl ON cl.ci = x.cil
    JOIN ms_coef cr ON cr.ci = x.cir
    JOIN ms_adapt al ON al.ni = x.nl
    JOIN ms_adapt ar ON ar.ni = x.nr
  ) w
)
"""


# DuckDB reconstruction of the 16-bit PNG corpus (see _png16_corpus):
# native sample j = 256*byte(2j) + byte(2j+1) of the md5 expansion.
_PNG16_CTE = f"""
p16_media AS (
  SELECT CAST(i AS BIGINT) AS media_id,
         CASE i%4 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 2 ELSE 4 END AS ch
  FROM range(12) t(i)
),
p16_chunks AS (
  SELECT m.media_id, m.ch, {_PNG_W * _PNG_H * 2}*m.ch AS need,
         CAST(c.j AS INT) AS counter,
         md5(m.media_id || ':png16:' || c.j) AS h
  FROM p16_media m, range(64) c(j)
  WHERE c.j*16 < {_PNG_W * _PNG_H * 2}*m.ch
),
p16_bytes AS (
  SELECT media_id, ch, counter*16 + CAST(g.j AS INT) AS pos,
         16*(strpos('0123456789abcdef', substr(h, CAST(2*g.j+1 AS INT), 1))-1)
           + (strpos('0123456789abcdef', substr(h, CAST(2*g.j+2 AS INT), 1))-1)
           AS b
  FROM p16_chunks, range(16) g(j)
  WHERE counter*16 + g.j < need
),
p16_samples AS (
  SELECT media_id, ch, pos // 2 AS j,
         SUM(b * CASE pos % 2 WHEN 0 THEN 256 ELSE 1 END) AS v
  FROM p16_bytes GROUP BY media_id, ch, pos // 2
),
p16t_bytes AS (
  SELECT CAST(m.i AS BIGINT) AS media_id,
         c.j*16 + CAST(g.j AS INT) AS pos,
         16*(strpos('0123456789abcdef',
              substr(md5(m.i || ':png16:' || c.j),
                     CAST(2*g.j+1 AS INT), 1))-1)
           + (strpos('0123456789abcdef',
              substr(md5(m.i || ':png16:' || c.j),
                     CAST(2*g.j+2 AS INT), 1))-1) AS b
  FROM range(12, 14) m(i), range(16) c(j), range(16) g(j)
),
p16t_raw AS (
  SELECT media_id, pos // 2 AS j,
         SUM(b * CASE pos % 2 WHEN 0 THEN 256 ELSE 1 END) AS v
  FROM p16t_bytes GROUP BY media_id, pos // 2
),
p16t_keys AS (
  SELECT media_id, v AS k0 FROM p16t_raw WHERE j = 0
),
-- 16-bit tRNS streams: gray (id 12, ch 2) emits sample + alpha;
-- RGB (id 13, ch 4, planted r=g=b) emits the sample x3 + alpha —
-- alpha = 0 where the sample equals the image's own first sample
p16t_samples AS (
  SELECT media_id, 2 AS ch, v FROM p16t_raw WHERE media_id = 12
  UNION ALL
  SELECT t.media_id, 2, CASE WHEN v = k.k0 THEN 0 ELSE 65535 END
  FROM p16t_raw t JOIN p16t_keys k USING (media_id) WHERE t.media_id = 12
  UNION ALL
  SELECT media_id, 4, v FROM p16t_raw, range(3) r(n) WHERE media_id = 13
  UNION ALL
  SELECT t.media_id, 4, CASE WHEN v = k.k0 THEN 0 ELSE 65535 END
  FROM p16t_raw t JOIN p16t_keys k USING (media_id) WHERE t.media_id = 13
)
"""


QUERIES = {
    "q36_media_byte_features": q36_media_byte_features,
    "q37_media_decode": q37_media_decode,
    "q38_frame_sample": q38_frame_sample,
    "q37b_media_resize": q37b_media_resize,
    "q38b_audio_features": q38b_audio_features,
    "q81_image_dhash": q81_image_dhash,
    "q82_image_neardup": q82_image_neardup,
    "q88_png_color": q88_png_color,
    "q204_jpeg_mosaic": q204_jpeg_mosaic,
    "q205_wav_native": q205_wav_native,
    "q206_png16_native": q206_png16_native,
    "q215_gif_bmp": q215_gif_bmp,
    "q230_bmp_complete": q230_bmp_complete,
    "q231_jpeg_cmyk": q231_jpeg_cmyk,
    "q232_mov_mjpeg": q232_mov_mjpeg,
    "q233_mov_frames": q233_mov_frames,
    "q234_mov_audio": q234_mov_audio,
    "q235_apng": q235_apng,
    "q236_tiff": q236_tiff,
    "q221_gif_frames": q221_gif_frames,
    "q225_avi_mjpeg": q225_avi_mjpeg,
    "q226_avi_frames": q226_avi_frames,
    "q227_video_dhash": q227_video_dhash,
    "q228_video_neardup": q228_video_neardup,
    "q229_avi_audio": q229_avi_audio,
    "q209_audio_fingerprint": q209_audio_fingerprint,
    "q210_audio_neardup": q210_audio_neardup,
}

# Shared DuckDB reconstruction of the GIF/BMP corpus byte streams +
# the media-9 compositing replay (see _gif_bmp_corpus): used by the
# q215 whole-file gate and the q221 per-frame gate.
_GB_CTES = """gb_media AS (
          SELECT CAST(i AS BIGINT) AS media_id,
                 CASE WHEN i IN (4, 5) THEN 384
                      WHEN i = 8 THEN 384
                      WHEN i = 9 THEN 192 ELSE 128 END AS need,
                 CASE WHEN i < 2 THEN 'gif'
                      WHEN i < 4 THEN 'gif_t'
                      WHEN i < 6 THEN 'bmp24'
                      WHEN i < 8 THEN 'bmp8'
                      WHEN i = 8 THEN 'anim' ELSE 'anim_t' END AS form
          FROM range(10) t(i)
        ),
        gb_bytes AS (
          SELECT m.media_id, m.form, c.j*16 + g.j AS pos,
                 16*(strpos('0123456789abcdef',
                      substr(md5(m.media_id || ':gb:' || c.j),
                             CAST(2*g.j+1 AS INT), 1))-1)
                   + (strpos('0123456789abcdef',
                      substr(md5(m.media_id || ':gb:' || c.j),
                             CAST(2*g.j+2 AS INT), 1))-1) AS b
          FROM gb_media m, range(24) c(j), range(16) g(j)
          WHERE c.j*16 + g.j < m.need
        ),
        -- media 9 compositing replay: the 16x8 canvas per pixel.
        -- i0 = frame 0's full-canvas index; i1 = frame 1's index when
        -- the pixel is inside its 8x4 rect at (4,2), else NULL;
        -- i2 likewise for frame 2's rect at (0,4). Layout mirrors the
        -- corpus builder: idx0 = bytes[0:128], idx1 = bytes[128:160],
        -- idx2 = bytes[160:192], all %64.
        a9_grid AS (
          SELECT b0.pos // 16 AS y, b0.pos % 16 AS x,
                 b0.b % 64 AS i0, b1.b % 64 AS i1, b2.b % 64 AS i2
          FROM gb_bytes b0
          LEFT JOIN gb_bytes b1
            ON b1.media_id = 9
           AND (b0.pos // 16) BETWEEN 2 AND 5
           AND (b0.pos % 16) BETWEEN 4 AND 11
           AND b1.pos = 128 + ((b0.pos // 16) - 2)*8 + ((b0.pos % 16) - 4)
          LEFT JOIN gb_bytes b2
            ON b2.media_id = 9
           AND (b0.pos // 16) BETWEEN 4 AND 7
           AND (b0.pos % 16) BETWEEN 0 AND 7
           AND b2.pos = 160 + ((b0.pos // 16) - 4)*8 + (b0.pos % 16)
          WHERE b0.media_id = 9 AND b0.pos < 128
        ),
        -- effective palette index per (pixel, frame): frame 1's
        -- transparent pixels (index 7) keep frame 0; frame 1's
        -- disposal 2 restores its rect to transparent black before
        -- frame 2, so frame 2 pixels inside rect1 that frame 2 does
        -- not repaint are NULL (no bytes — rgb 0, alpha 0)
        a9_eff AS (
          SELECT y, x, 0 AS f, i0 AS eff FROM a9_grid
          UNION ALL
          SELECT y, x, 1,
                 CASE WHEN i1 IS NOT NULL AND i1 <> 7 THEN i1 ELSE i0 END
          FROM a9_grid
          UNION ALL
          SELECT y, x, 2,
                 CASE WHEN i2 IS NOT NULL AND i2 <> 7 THEN i2
                      WHEN y BETWEEN 2 AND 5 AND x BETWEEN 4 AND 11
                        THEN NULL
                      ELSE i0 END
          FROM a9_grid
        )"""


# Shared DuckDB reconstruction of the AVI/MJPEG corpus (r12 — see
# _avi_corpus): frame f of clip i is a 3x2 mosaic of constant 8x8
# blocks, block j = byte j of md5('{i}:avi:{f}') — the q204 exactness
# argument per frame, summed over frames for the whole-clip gate.
_AVI_BLOCK_CTES = f"""avi_spec(media_id, nf, ch) AS (
          VALUES (CAST(0 AS BIGINT), 4, 1), (1, 3, 1), (2, 5, 1),
                 (3, 4, 1), (4, 2, 3)
        ),
        avi_blocks AS (
          SELECT s.media_id, s.nf, s.ch, CAST(c.f AS INT) AS frame,
                 CAST(u.j AS INT) AS blk,
                 16*(strpos('0123456789abcdef',
                      substr(md5(s.media_id || ':avi:' || c.f),
                             CAST(2*u.j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5(s.media_id || ':avi:' || c.f),
                             CAST(2*u.j+2 AS INT), 1))-1) AS v
          FROM avi_spec s, range(5) c(f),
               range({_JPEG_BW * _JPEG_BH}) u(j)
          WHERE c.f < s.nf
        ),
        -- clips 6-7 (r12): raw-DIB frame bytes, md5-expanded per
        -- frame ('6:avidib:{{f}}:{{chunk}}', 72 chunks x 16 hex
        -- pairs = {_JPEG_BW * _JPEG_BH * 64 * 3} bytes/frame); clip
        -- 7 is clip 6's PLANTED NEAR-DUP: +8 mod 256 at every 37th
        -- byte. Decode is byte-lossless so moments are direct sums.
        avi_dib AS (
          SELECT CAST(m.i AS BIGINT) AS media_id,
                 CAST(c.f AS INT) AS frame,
                 CAST(k.c*16 + g.j AS INT) AS pos,
                 CASE WHEN m.i = 7 AND (k.c*16 + g.j) % 37 = 0
                      THEN (16*(strpos('0123456789abcdef',
                             substr(md5('6:avidib:' || c.f || ':' || k.c),
                                    CAST(2*g.j+1 AS INT), 1))-1)
                          + (strpos('0123456789abcdef',
                             substr(md5('6:avidib:' || c.f || ':' || k.c),
                                    CAST(2*g.j+2 AS INT), 1))-1) + 8) % 256
                      ELSE 16*(strpos('0123456789abcdef',
                             substr(md5('6:avidib:' || c.f || ':' || k.c),
                                    CAST(2*g.j+1 AS INT), 1))-1)
                          + (strpos('0123456789abcdef',
                             substr(md5('6:avidib:' || c.f || ':' || k.c),
                                    CAST(2*g.j+2 AS INT), 1))-1)
                 END AS v
          FROM (VALUES (6), (7)) m(i), range(2) c(f),
               range(72) k(c), range(16) g(j)
          WHERE k.c*16 + g.j < {_JPEG_BW * _JPEG_BH * 64 * 3}
        )"""


# Shared dHash replay over the AVI corpus (q227/q228): luma grid ->
# gradient bits -> hex, all integer-exact. Composes after
# _AVI_BLOCK_CTES (needs avi_blocks.blk and avi_dib.pos).
_AVI_DHASH_CTES = """avi_grid AS (
          SELECT CAST(y.yy AS INT) AS yy, CAST(x.xx AS INT) AS xx,
                 CAST(2 * y.yy AS INT) AS ry,
                 CAST((x.xx * 24) // 9 AS INT) AS cx
          FROM range(8) y(yy), range(9) x(xx)
        ),
        avi_lum AS (
          SELECT b.media_id, b.frame, g.yy, g.xx, b.v AS lum
          FROM avi_grid g JOIN avi_blocks b
            ON b.blk = (g.ry // 8) * 3 + (g.cx // 8)
          UNION ALL
          SELECT d.media_id, d.frame, g.yy, g.xx,
                 (299 * MAX(CASE WHEN d.pos = (g.ry*24 + g.cx)*3
                            THEN d.v END)
                + 587 * MAX(CASE WHEN d.pos = (g.ry*24 + g.cx)*3 + 1
                            THEN d.v END)
                + 114 * MAX(CASE WHEN d.pos = (g.ry*24 + g.cx)*3 + 2
                            THEN d.v END)) // 1000 AS lum
          FROM avi_grid g JOIN avi_dib d
            ON d.pos BETWEEN (g.ry*24 + g.cx)*3
                         AND (g.ry*24 + g.cx)*3 + 2
          GROUP BY d.media_id, d.frame, g.yy, g.xx
        ),
        avi_bits AS (
          SELECT l.media_id, l.frame,
                 CAST(l.yy * 8 + l.xx AS INT) AS i,
                 CASE WHEN r.lum > l.lum THEN 1 ELSE 0 END AS b
          FROM avi_lum l JOIN avi_lum r
            ON r.media_id = l.media_id AND r.frame = l.frame
           AND r.yy = l.yy AND r.xx = l.xx + 1
          WHERE l.xx < 8
        ),
        avi_nib AS (
          SELECT media_id, frame, i // 4 AS n,
                 SUM(b * (8 >> CAST(i % 4 AS INT))) AS nv
          FROM avi_bits GROUP BY media_id, frame, i // 4
        ),
        avi_hexes AS (
          SELECT media_id, frame,
                 string_agg(substr('0123456789abcdef',
                                   CAST(nv + 1 AS INT), 1),
                            '' ORDER BY n) AS dhash
          FROM avi_nib GROUP BY media_id, frame
        )"""


ORACLES = {
    "q36_media_byte_features": """
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               md5(text) AS digest
        FROM documents ORDER BY media_id
    """,
    "q37_media_decode": f"""
        WITH {_MEDIA_BYTES_CTE}
        SELECT media_id, kind, width, height, n_frames,
               CAST(11 + need AS INTEGER) AS n_bytes,
               CAST(SUM(b) AS BIGINT) AS px_sum,
               CAST(SUM(b*b) AS BIGINT) AS px_sqsum
        FROM mbytes
        GROUP BY media_id, kind, width, height, n_frames, need
        ORDER BY media_id
    """,
    "q38_frame_sample": f"""
        WITH {_MEDIA_BYTES_CTE}
        SELECT media_id,
               CAST(pos // (width*height) AS INTEGER) AS frame_idx,
               CAST(SUM(b) AS BIGINT) AS frame_px_sum
        FROM mbytes
        WHERE kind = 3 AND (pos // (width*height)) % 2 = 0
        GROUP BY media_id, frame_idx
        ORDER BY media_id, frame_idx
    """,
    # resize gather for 32x16 -> 8x8: rows (arange(8)*16)//8 = even y,
    # cols (arange(8)*32)//8 = x % 4 == 0; output container = 11-byte
    # header + 64 pixels
    "q37b_media_resize": f"""
        WITH {_MEDIA_BYTES_CTE}
        SELECT media_id,
               CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
               CAST(75 AS INTEGER) AS n_bytes,
               CAST(SUM(b) AS BIGINT) AS px_sum,
               CAST(SUM(b*b) AS BIGINT) AS px_sqsum
        FROM mbytes
        WHERE kind = 1 AND (pos // 32) % 2 = 0 AND (pos % 32) % 4 = 0
        GROUP BY media_id
        ORDER BY media_id
    """,
    "q38b_audio_features": f"""
        WITH {_MEDIA_BYTES_CTE}
        SELECT media_id, CAST(need AS INTEGER) AS n_samples,
               CAST(SUM(b) AS BIGINT) AS px_sum,
               CAST(SUM(b*b) AS BIGINT) AS px_sqsum
        FROM mbytes
        WHERE kind = 2
        GROUP BY media_id, need
        ORDER BY media_id
    """,
    "q81_image_dhash": f"""
        WITH {_DHASH_CTES}
        SELECT media_id, dhash FROM hashes ORDER BY media_id
    """,
    "q88_png_color": f"""
        WITH {_PNG_COLOR_CTE}
        SELECT media_id,
               CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
               CAST(CASE color_type WHEN 6 THEN 4 ELSE 3 END AS INTEGER)
                 AS channels,
               CAST(SUM(b) AS BIGINT) AS px_sum,
               CAST(SUM(b*b) AS BIGINT) AS px_sqsum
        FROM png_px
        GROUP BY media_id, color_type
        UNION ALL
        SELECT media_id,
               CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
               CAST(channels AS INTEGER) AS channels,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(v*v) AS BIGINT) AS px_sqsum
        FROM pngt_px
        GROUP BY media_id, channels
        ORDER BY media_id
    """,
    "q204_jpeg_mosaic": f"""
        WITH blocks AS (
          SELECT CAST(i AS BIGINT) AS media_id, CAST(j AS INT) AS blk,
                 16*(strpos('0123456789abcdef',
                      substr(md5(i || ':jpg:0'), CAST(2*j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5(i || ':jpg:0'), CAST(2*j+2 AS INT), 1))-1)
                   AS v
          FROM range(38) t(i), range({_JPEG_BW * _JPEG_BH}) u(j)
          WHERE i NOT IN (32, 33, 34)
        ),
        -- lossless clips 32-33 (r10): every pixel byte IS the md5
        -- expansion (SOF3 decode is exact, the round trip cancels)
        jl_bytes AS (
          SELECT CAST(m.i AS BIGINT) AS media_id, m.ch,
                 16*(strpos('0123456789abcdef',
                      substr(md5(m.i || ':jpgl:' || c.j),
                             CAST(2*g.j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5(m.i || ':jpgl:' || c.j),
                             CAST(2*g.j+2 AS INT), 1))-1) AS v
          FROM (VALUES (32, 1), (33, 3), (39, 1)) m(i, ch),
               range(72) c(j), range(16) g(j)
          WHERE c.j*16 + g.j < {_JPEG_BW * _JPEG_BH * 64} * m.ch
        ),
        -- clip 38 (r11): point-transformed lossless (Al=2) — every
        -- decoded pixel is the expansion byte with the low 2 bits
        -- masked ((b >> 2) << 2)
        jl_pt AS (
          SELECT CAST(38 AS BIGINT) AS media_id,
                 ((16*(strpos('0123456789abcdef',
                      substr(md5('38:jpgl:' || c.j),
                             CAST(2*g.j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5('38:jpgl:' || c.j),
                             CAST(2*g.j+2 AS INT), 1))-1)) // 4) * 4 AS v
          FROM range(24) c(j), range(16) g(j)
          WHERE c.j*16 + g.j < {_JPEG_BW * _JPEG_BH * 64}
        ),
        jl40a AS (
          SELECT 16*(strpos('0123456789abcdef',
                      substr(md5('40:jpgl:' || c.j),
                             CAST(2*g.j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5('40:jpgl:' || c.j),
                             CAST(2*g.j+2 AS INT), 1))-1) AS v
          FROM range(24) c(j), range(16) g(j)
          WHERE c.j*16 + g.j < {_JPEG_BW * _JPEG_BH * 64}
        ),
        jl40b AS (
          SELECT 16*(strpos('0123456789abcdef',
                      substr(md5('40:jpglc:' || c.j),
                             CAST(2*g.j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5('40:jpglc:' || c.j),
                             CAST(2*g.j+2 AS INT), 1))-1) AS v
          FROM range(6) c(j), range(16) g(j)
          WHERE c.j*16 + g.j < {_JPEG_BW * _JPEG_BH * 16}
        )
        SELECT media_id,
               CAST({_JPEG_BW * 8} AS INTEGER) AS width,
               CAST({_JPEG_BH * 8} AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS channels,
               CAST(64 * SUM(v) AS BIGINT) AS px_sum,
               CAST(64 * SUM(v*v) AS BIGINT) AS px_sqsum
        FROM blocks WHERE media_id NOT IN (35, 37)
        GROUP BY media_id
        UNION ALL
        -- clips 35/37 (r11): gray-valued RGB mosaics through the
        -- Huffman-subset / arithmetic-subset scan scripts — decode is
        -- exact (Cb=Cr quantize to 0), so moments are the gray block
        -- formula times 3 channels
        SELECT media_id,
               CAST({_JPEG_BW * 8} AS INTEGER),
               CAST({_JPEG_BH * 8} AS INTEGER),
               CAST(3 AS INTEGER),
               CAST(3 * 64 * SUM(v) AS BIGINT),
               CAST(3 * 64 * SUM(v*v) AS BIGINT)
        FROM blocks WHERE media_id IN (35, 37)
        GROUP BY media_id
        UNION ALL
        SELECT media_id,
               CAST({_JPEG_BW * 8} AS INTEGER),
               CAST({_JPEG_BH * 8} AS INTEGER),
               CAST(ch AS INTEGER),
               CAST(SUM(v) AS BIGINT),
               CAST(SUM(v*v) AS BIGINT)
        FROM jl_bytes
        GROUP BY media_id, ch
        UNION ALL
        -- clip 40 (r12): SUBSAMPLED lossless — c0 full-res bytes
        -- (':jpgl:' expansion) plus c1 half-res bytes (':jpglc:'),
        -- each c1 sample replicated 4x by the nearest upsample
        SELECT CAST(40 AS BIGINT),
               CAST({_JPEG_BW * 8} AS INTEGER),
               CAST({_JPEG_BH * 8} AS INTEGER),
               CAST(2 AS INTEGER),
               CAST((SELECT SUM(v) FROM jl40a)
                    + 4 * (SELECT SUM(v) FROM jl40b) AS BIGINT),
               CAST((SELECT SUM(v*v) FROM jl40a)
                    + 4 * (SELECT SUM(v*v) FROM jl40b) AS BIGINT)
        UNION ALL
        SELECT media_id,
               CAST({_JPEG_BW * 8} AS INTEGER),
               CAST({_JPEG_BH * 8} AS INTEGER),
               CAST(1 AS INTEGER),
               CAST(SUM(v) AS BIGINT),
               CAST(SUM(v*v) AS BIGINT)
        FROM jl_pt
        GROUP BY media_id
        UNION ALL
        -- clip 34 (r11): NON-INTERLEAVED arithmetic color — the Y/Cb/
        -- Cr planes are the id-24/25/26 third-party QM streams spliced
        -- into Ns=1 scans (the constant blocks decode exactly), so the
        -- expected pixels are the JFIF conversion of the three md5
        -- constants per block. round_even replays numpy's half-even
        -- rounding bit-exactly on these doubles (probed over the full
        -- byte range); the clip planted no exact-.5 boundary anyway.
        SELECT CAST(34 AS BIGINT),
               CAST({_JPEG_BW * 8} AS INTEGER),
               CAST({_JPEG_BH * 8} AS INTEGER),
               CAST(3 AS INTEGER),
               CAST(64 * SUM(r + g + bb) AS BIGINT),
               CAST(64 * SUM(r*r + g*g + bb*bb) AS BIGINT)
        FROM (
          SELECT
            GREATEST(0, LEAST(255, round_even(CAST(
              y.v + 1.402*(cr.v - 128.0) AS DOUBLE), 0))) AS r,
            GREATEST(0, LEAST(255, round_even(CAST(
              y.v - 0.344136*(cb.v - 128.0) - 0.714136*(cr.v - 128.0)
              AS DOUBLE), 0))) AS g,
            GREATEST(0, LEAST(255, round_even(CAST(
              y.v + 1.772*(cb.v - 128.0) AS DOUBLE), 0))) AS bb
          FROM blocks y
          JOIN blocks cb ON cb.media_id = 25 AND cb.blk = y.blk
          JOIN blocks cr ON cr.media_id = 26 AND cr.blk = y.blk
          WHERE y.media_id = 24
        )
        ORDER BY media_id
    """,
    "q205_wav_native": f"""
        WITH RECURSIVE {_WAV_NATIVE_CTE},
        {_ADPCM_CTE},
        {_MSADPCM_CTE}
        SELECT media_id, 'pcm' AS codec, CAST(bits AS INTEGER) AS bits,
               CAST({_WAV_FRAMES} AS INTEGER) AS n_samples,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(CAST(v AS HUGEINT) * v) // 1000000000000000000
                    AS BIGINT) AS px_sqsum_hi,
               CAST(SUM(CAST(v AS HUGEINT) * v) % 1000000000000000000
                    AS BIGINT) AS px_sqsum_lo
        FROM wav_folded
        GROUP BY media_id, bits
        UNION ALL
        SELECT media_id, 'float' AS codec, CAST(bits AS INTEGER) AS bits,
               CAST({_WAV_FRAMES} AS INTEGER) AS n_samples,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(CAST(v AS HUGEINT) * v) // 1000000000000000000
                    AS BIGINT) AS px_sqsum_hi,
               CAST(SUM(CAST(v AS HUGEINT) * v) % 1000000000000000000
                    AS BIGINT) AS px_sqsum_lo
        FROM wavf_folded
        GROUP BY media_id, bits
        UNION ALL
        SELECT media_id, 'adpcm' AS codec, CAST(4 AS INTEGER) AS bits,
               CAST(SUM(nmax + 2) AS INTEGER) AS n_samples,
               CAST(SUM(s) AS BIGINT) AS px_sum,
               CAST(SUM(sq) // 1000000000000000000 AS BIGINT)
                    AS px_sqsum_hi,
               CAST(SUM(sq) % 1000000000000000000 AS BIGINT)
                    AS px_sqsum_lo
        FROM ad_walk WHERE p = nmax
        GROUP BY media_id
        UNION ALL
        SELECT media_id, 'adpcm' AS codec, CAST(4 AS INTEGER) AS bits,
               CAST(COUNT(*) AS INTEGER) AS n_samples,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(CAST(v AS HUGEINT) * v) // 1000000000000000000
                    AS BIGINT) AS px_sqsum_hi,
               CAST(SUM(CAST(v AS HUGEINT) * v) % 1000000000000000000
                    AS BIGINT) AS px_sqsum_lo
        FROM ad2_frames
        GROUP BY media_id
        UNION ALL
        SELECT media_id, 'adpcm' AS codec, CAST(4 AS INTEGER) AS bits,
               CAST(COUNT(*) AS INTEGER) AS n_samples,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(CAST(v AS HUGEINT) * v) // 1000000000000000000
                    AS BIGINT) AS px_sqsum_hi,
               CAST(SUM(CAST(v AS HUGEINT) * v) % 1000000000000000000
                    AS BIGINT) AS px_sqsum_lo
        FROM ad3_frames
        GROUP BY media_id
        UNION ALL
        SELECT media_id, 'msadpcm' AS codec, CAST(4 AS INTEGER) AS bits,
               CAST(SUM(nmax + 3) AS INTEGER) AS n_samples,
               CAST(SUM(s) AS BIGINT) AS px_sum,
               CAST(SUM(sq) // 1000000000000000000 AS BIGINT)
                    AS px_sqsum_hi,
               CAST(SUM(sq) % 1000000000000000000 AS BIGINT)
                    AS px_sqsum_lo
        FROM ms1_walk WHERE p = nmax
        GROUP BY media_id
        UNION ALL
        SELECT media_id, 'msadpcm' AS codec, CAST(4 AS INTEGER) AS bits,
               CAST(SUM(nmax + 3) AS INTEGER) AS n_samples,
               CAST(SUM(s) AS BIGINT) AS px_sum,
               CAST(SUM(sq) // 1000000000000000000 AS BIGINT)
                    AS px_sqsum_hi,
               CAST(SUM(sq) % 1000000000000000000 AS BIGINT)
                    AS px_sqsum_lo
        FROM ms2_walk WHERE p = nmax
        GROUP BY media_id
        UNION ALL
        SELECT media_id,
               CASE WHEN media_id = 34 THEN 'ulaw' ELSE 'alaw' END
                 AS codec,
               CAST(8 AS INTEGER) AS bits,
               CAST({_WAV_FRAMES} AS INTEGER) AS n_samples,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(CAST(v AS HUGEINT) * v) // 1000000000000000000
                    AS BIGINT) AS px_sqsum_hi,
               CAST(SUM(CAST(v AS HUGEINT) * v) % 1000000000000000000
                    AS BIGINT) AS px_sqsum_lo
        FROM g711_folded
        GROUP BY media_id
        ORDER BY media_id
    """,
    "q215_gif_bmp": f"""
        WITH {_GB_CTES},
        -- decoded channel-byte streams: GIF/BMP8 expand indices (b%64)
        -- through the shared 37/59/83 palette; transparent GIFs key
        -- index 7 (r10 compositing semantics: a transparent pixel
        -- keeps the transparent-black canvas -> rgb 0, alpha 0, it
        -- does NOT paint palette color under alpha 0); 24-bit BMP
        -- pixels ARE the expansion bytes (BGR<->RGB cancels in moments)
        gb_px AS (
          SELECT media_id,
                 CASE WHEN form = 'gif_t' THEN 4 ELSE 3 END AS channels,
                 CASE WHEN form = 'gif_t' AND b%64 = 7 THEN 0
                      ELSE ((b%64)*37)%256 END AS v
          FROM gb_bytes WHERE form IN ('gif', 'gif_t', 'bmp8')
          UNION ALL
          SELECT media_id, CASE WHEN form = 'gif_t' THEN 4 ELSE 3 END,
                 CASE WHEN form = 'gif_t' AND b%64 = 7 THEN 0
                      ELSE ((b%64)*59)%256 END
          FROM gb_bytes WHERE form IN ('gif', 'gif_t', 'bmp8')
          UNION ALL
          SELECT media_id, CASE WHEN form = 'gif_t' THEN 4 ELSE 3 END,
                 CASE WHEN form = 'gif_t' AND b%64 = 7 THEN 0
                      ELSE ((b%64)*83)%256 END
          FROM gb_bytes WHERE form IN ('gif', 'gif_t', 'bmp8')
          UNION ALL
          SELECT media_id, 4, CASE WHEN b%64 = 7 THEN 0 ELSE 255 END
          FROM gb_bytes WHERE form = 'gif_t'
          UNION ALL
          SELECT media_id, 3, b FROM gb_bytes WHERE form = 'bmp24'
          -- media 8: three independent full-canvas opaque frames —
          -- the whole 384-byte index stream expands through the
          -- palette frame after frame
          UNION ALL
          SELECT media_id, 3, ((b%64)*37)%256
          FROM gb_bytes WHERE form = 'anim'
          UNION ALL
          SELECT media_id, 3, ((b%64)*59)%256
          FROM gb_bytes WHERE form = 'anim'
          UNION ALL
          SELECT media_id, 3, ((b%64)*83)%256
          FROM gb_bytes WHERE form = 'anim'
          -- media 9: the composited animation — per-pixel effective
          -- index per frame from a9_eff below (NULL = transparent
          -- canvas after the disposal-2 restore: contributes zero
          -- bytes, so it is simply absent from the sum)
          UNION ALL
          SELECT 9, 4, ((eff*37)%256) FROM a9_eff WHERE eff IS NOT NULL
          UNION ALL
          SELECT 9, 4, ((eff*59)%256) FROM a9_eff WHERE eff IS NOT NULL
          UNION ALL
          SELECT 9, 4, ((eff*83)%256) FROM a9_eff WHERE eff IS NOT NULL
          UNION ALL
          SELECT 9, 4, 255 FROM a9_eff WHERE eff IS NOT NULL
        )
        SELECT g.media_id,
               CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
               CAST(CASE WHEN m.form IN ('anim', 'anim_t') THEN 3
                         ELSE 1 END AS INTEGER) AS n_frames,
               CAST(g.channels AS INTEGER) AS channels,
               CAST(SUM(g.v) AS BIGINT) AS px_sum,
               CAST(SUM(g.v*g.v) AS BIGINT) AS px_sqsum
        FROM gb_px g JOIN gb_media m ON g.media_id = m.media_id
        GROUP BY g.media_id, g.channels, m.form
        ORDER BY g.media_id
    """,
    "q230_bmp_complete": """
        WITH b2_media AS (
          SELECT CAST(i AS BIGINT) AS media_id,
                 CASE WHEN i IN (14, 15, 16) THEN 384 ELSE 128 END
                   AS need,
                 CASE WHEN i IN (10, 17) THEN 'bmp8'
                      WHEN i IN (11, 12) THEN 'bmp4'
                      WHEN i = 13 THEN 'bmp1'
                      WHEN i = 14 THEN 'b555'
                      WHEN i = 15 THEN 'b565'
                      ELSE 'raw' END AS form,
                 CASE WHEN i IN (10, 17) THEN 64
                      WHEN i IN (11, 12) THEN 16
                      WHEN i = 13 THEN 2 END AS pmod
          FROM range(10, 18) t(i)
        ),
        b2_bytes AS (
          SELECT m.media_id, m.form, m.pmod, c.j*16 + g.j AS pos,
                 16*(strpos('0123456789abcdef',
                      substr(md5(m.media_id || ':gb:' || c.j),
                             CAST(2*g.j+1 AS INT), 1))-1)
                   + (strpos('0123456789abcdef',
                      substr(md5(m.media_id || ':gb:' || c.j),
                             CAST(2*g.j+2 AS INT), 1))-1) AS b
          FROM b2_media m, range(24) c(j), range(16) g(j)
          WHERE c.j*16 + g.j < m.need
        ),
        -- decoded channel-byte streams: palette forms expand indices
        -- through the shared 37/59/83 palette; the 16-bit forms
        -- replay the pinned bit replication ((v<<3)|(v>>2) for 5-bit
        -- fields = v*8 + v//4, (v<<2)|(v>>4) for the 565 green = v*4
        -- + v//16); 32-bit BGRX pixels ARE the expansion bytes
        b2_px AS (
          SELECT media_id, ((b % pmod)*37)%256 AS v
          FROM b2_bytes WHERE form IN ('bmp8', 'bmp4', 'bmp1')
          UNION ALL
          SELECT media_id, ((b % pmod)*59)%256
          FROM b2_bytes WHERE form IN ('bmp8', 'bmp4', 'bmp1')
          UNION ALL
          SELECT media_id, ((b % pmod)*83)%256
          FROM b2_bytes WHERE form IN ('bmp8', 'bmp4', 'bmp1')
          UNION ALL
          SELECT media_id, (b%32)*8 + (b%32)//4
          FROM b2_bytes WHERE form = 'b555'
          UNION ALL
          SELECT media_id,
                 CASE WHEN pos % 3 = 1 THEN (b%64)*4 + (b%64)//16
                      ELSE (b%32)*8 + (b%32)//4 END
          FROM b2_bytes WHERE form = 'b565'
          UNION ALL
          SELECT media_id, b FROM b2_bytes WHERE form = 'raw'
        )
        SELECT media_id,
               CAST(16 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS n_frames,
               CAST(3 AS INTEGER) AS channels,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(v*v) AS BIGINT) AS px_sqsum
        FROM b2_px
        GROUP BY media_id
        ORDER BY media_id
    """,
    "q232_mov_mjpeg": f"""
        WITH mov_spec(media_id, nf, ch) AS (
          VALUES (CAST(0 AS BIGINT), 3, 1), (1, 2, 1), (3, 2, 3)
        ),
        mov_blocks AS (
          SELECT s.media_id, s.nf, s.ch, CAST(c.f AS INT) AS frame,
                 16*(strpos('0123456789abcdef',
                      substr(md5(s.media_id || ':mov:' || c.f),
                             CAST(2*u.j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5(s.media_id || ':mov:' || c.f),
                             CAST(2*u.j+2 AS INT), 1))-1) AS v
          FROM mov_spec s, range(3) c(f),
               range({_JPEG_BW * _JPEG_BH}) u(j)
          WHERE c.f < s.nf
        )
        SELECT media_id,
               CAST({_JPEG_BW * 8} AS INTEGER) AS width,
               CAST({_JPEG_BH * 8} AS INTEGER) AS height,
               CAST(nf AS INTEGER) AS n_frames,
               CAST(ch AS INTEGER) AS channels,
               CAST(ch * 64 * SUM(v) AS BIGINT) AS px_sum,
               CAST(ch * 64 * SUM(v*v) AS BIGINT) AS px_sqsum
        FROM mov_blocks
        GROUP BY media_id, nf, ch
        UNION ALL
        -- clip 2: sample format mjpa, valid-unsupported — stsd dims
        -- + stsz frame count with NULL moments
        SELECT CAST(2 AS BIGINT), {_JPEG_BW * 8}, {_JPEG_BH * 8},
               3, 0, NULL, NULL
        ORDER BY media_id
    """,
    "q233_mov_frames": f"""
        WITH mov_spec(media_id, nf, ch) AS (
          VALUES (CAST(0 AS BIGINT), 3, 1), (1, 2, 1), (3, 2, 3)
        ),
        mov_blocks AS (
          SELECT s.media_id, s.nf, s.ch, CAST(c.f AS INT) AS frame,
                 16*(strpos('0123456789abcdef',
                      substr(md5(s.media_id || ':mov:' || c.f),
                             CAST(2*u.j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5(s.media_id || ':mov:' || c.f),
                             CAST(2*u.j+2 AS INT), 1))-1) AS v
          FROM mov_spec s, range(3) c(f),
               range({_JPEG_BW * _JPEG_BH}) u(j)
          WHERE c.f < s.nf
        )
        SELECT media_id, frame AS frame_idx,
               CAST(ch * 64 * SUM(v) AS BIGINT) AS frame_px_sum
        FROM mov_blocks
        WHERE frame % 2 = 0
        GROUP BY media_id, frame, ch
        ORDER BY media_id, frame_idx
    """,
    "q236_tiff": """
        WITH tf_media(media_id, need) AS (
          VALUES (CAST(0 AS BIGINT), 128), (1, 128), (2, 384),
                 (3, 128), (4, 16)
        ),
        tf_bytes AS (
          SELECT m.media_id, c.j*16 + g.j AS pos,
                 16*(strpos('0123456789abcdef',
                      substr(md5(m.media_id || ':tiff:' || c.j),
                             CAST(2*g.j+1 AS INT), 1))-1)
                   + (strpos('0123456789abcdef',
                      substr(md5(m.media_id || ':tiff:' || c.j),
                             CAST(2*g.j+2 AS INT), 1))-1) AS b
          FROM tf_media m, range(24) c(j), range(16) g(j)
          WHERE c.j*16 + g.j < m.need
        ),
        tf_px AS (
          -- 0: gray BlackIsZero — bytes ARE the samples
          SELECT media_id, b AS v FROM tf_bytes WHERE media_id = 0
          UNION ALL
          -- 1: gray WHITEISZERO — decode inverts the stored byte
          SELECT media_id, 255 - b FROM tf_bytes WHERE media_id = 1
          UNION ALL
          -- 2: RGB chunky — bytes ARE the channel stream
          SELECT media_id, b FROM tf_bytes WHERE media_id = 2
          UNION ALL
          -- 3: palette through the 37/59/83 ColorMap (16-bit
          -- entries v<<8 reduced back >>8 — the identity round trip)
          SELECT media_id, (b*37)%256 FROM tf_bytes WHERE media_id = 3
          UNION ALL
          SELECT media_id, (b*59)%256 FROM tf_bytes WHERE media_id = 3
          UNION ALL
          SELECT media_id, (b*83)%256 FROM tf_bytes WHERE media_id = 3
          UNION ALL
          -- 4: bilevel — each packed byte expands MSB-first to eight
          -- 0/255 samples
          SELECT media_id, 255 * ((b >> CAST(7 - k.k AS INT)) & 1)
          FROM tf_bytes, range(8) k(k) WHERE media_id = 4
        )
        SELECT media_id,
               CAST(16 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS n_frames,
               CAST(CASE WHEN media_id IN (2, 3) THEN 3 ELSE 1 END
                    AS INTEGER) AS channels,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(v*v) AS BIGINT) AS px_sqsum
        FROM tf_px GROUP BY media_id
        UNION ALL
        -- 5: LZW compression flag — valid-unsupported, dims intact
        SELECT CAST(5 AS BIGINT), 16, 8, 1, 0, NULL, NULL
        ORDER BY media_id
    """,
    "q235_apng": """
        WITH ap_bytes AS (
          SELECT CAST(m.i AS BIGINT) AS media_id, c.j*16 + g.j AS pos,
                 16*(strpos('0123456789abcdef',
                      substr(md5(m.i || ':apng:' || c.j),
                             CAST(2*g.j+1 AS INT), 1))-1)
                   + (strpos('0123456789abcdef',
                      substr(md5(m.i || ':apng:' || c.j),
                             CAST(2*g.j+2 AS INT), 1))-1) AS b
          FROM (VALUES (0), (1), (3)) m(i), range(64) c(j),
               range(16) g(j)
          WHERE c.j*16 + g.j <
                CASE m.i WHEN 0 THEN 1024 WHEN 1 THEN 192 ELSE 256 END
        ),
        -- media 1 compositing grid (the q215 media-9 pattern under
        -- APNG ops): i0 = base index (b%15+1, never transparent);
        -- i1/i2 = rect indices (b%16, 0 = transparent) where covered
        ap_grid AS (
          SELECT b0.pos // 16 AS y, b0.pos % 16 AS x,
                 b0.b % 15 + 1 AS i0, b1.b % 16 AS i1, b2.b % 16 AS i2
          FROM ap_bytes b0
          LEFT JOIN ap_bytes b1
            ON b1.media_id = 1
           AND (b0.pos // 16) BETWEEN 2 AND 5
           AND (b0.pos % 16) BETWEEN 4 AND 11
           AND b1.pos = 128 + ((b0.pos // 16) - 2)*8 + ((b0.pos % 16) - 4)
          LEFT JOIN ap_bytes b2
            ON b2.media_id = 1
           AND (b0.pos // 16) BETWEEN 4 AND 7
           AND (b0.pos % 16) BETWEEN 0 AND 7
           AND b2.pos = 160 + ((b0.pos // 16) - 4)*8 + (b0.pos % 16)
          WHERE b0.media_id = 1 AND b0.pos < 128
        ),
        -- effective palette index per (pixel, frame): OVER keeps the
        -- canvas under transparent (index 0) source pixels; frame
        -- 1's dispose=BACKGROUND clears its rect to transparent
        -- black before frame 2 (NULL = no bytes, alpha 0)
        ap_eff AS (
          SELECT y, x, 0 AS f, i0 AS eff FROM ap_grid
          UNION ALL
          SELECT y, x, 1,
                 CASE WHEN i1 IS NOT NULL AND i1 <> 0 THEN i1 ELSE i0 END
          FROM ap_grid
          UNION ALL
          SELECT y, x, 2,
                 CASE WHEN i2 IS NOT NULL AND i2 <> 0 THEN i2
                      WHEN y BETWEEN 2 AND 5 AND x BETWEEN 4 AND 11
                        THEN NULL
                      ELSE i0 END
          FROM ap_grid
        ),
        ap_px AS (
          -- media 0: SOURCE blend — every canvas byte IS the
          -- expansion byte (both frames, all four channels)
          SELECT media_id, b AS v FROM ap_bytes WHERE media_id = 0
          UNION ALL
          -- media 3: gray replicated into RGB x3 (hidden IDAT
          -- default image excluded from the animation)
          SELECT media_id, b FROM ap_bytes WHERE media_id = 3
          UNION ALL
          SELECT media_id, b FROM ap_bytes WHERE media_id = 3
          UNION ALL
          SELECT media_id, b FROM ap_bytes WHERE media_id = 3
          UNION ALL
          -- media 1: palette expansion + opaque alpha per composited
          -- pixel; NULL (transparent canvas) contributes no bytes
          SELECT 1, ((eff*37)%256) FROM ap_eff WHERE eff IS NOT NULL
          UNION ALL
          SELECT 1, ((eff*59)%256) FROM ap_eff WHERE eff IS NOT NULL
          UNION ALL
          SELECT 1, ((eff*83)%256) FROM ap_eff WHERE eff IS NOT NULL
          UNION ALL
          SELECT 1, 255 FROM ap_eff WHERE eff IS NOT NULL
        )
        SELECT media_id,
               CAST(16 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height,
               CAST(CASE media_id WHEN 1 THEN 3 ELSE 2 END AS INTEGER)
                 AS n_frames,
               CAST(CASE media_id WHEN 3 THEN 3 ELSE 4 END AS INTEGER)
                 AS channels,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(v*v) AS BIGINT) AS px_sqsum
        FROM ap_px GROUP BY media_id
        UNION ALL
        -- media 2: fractional-alpha OVER — metadata-only
        SELECT CAST(2 AS BIGINT), 16, 8, 2, 0, NULL, NULL
        ORDER BY media_id
    """,
    "q234_mov_audio": """
        WITH ma_media(media_id, need) AS (
          VALUES (CAST(4 AS BIGINT), 400), (5, 200), (6, 200)
        ),
        ma_bytes AS (
          SELECT m.media_id, c.j*16 + g.j AS pos,
                 16*(strpos('0123456789abcdef',
                      substr(md5(m.media_id || ':movau:' || c.j),
                             CAST(2*g.j+1 AS INT), 1))-1)
                   + (strpos('0123456789abcdef',
                      substr(md5(m.media_id || ':movau:' || c.j),
                             CAST(2*g.j+2 AS INT), 1))-1) AS b
          FROM ma_media m, range(25) c(j), range(16) g(j)
          WHERE c.j*16 + g.j < m.need
        ),
        -- clips 4/5: int16 samples — 4 is little-endian ('sowt'),
        -- 5 is big-endian ('twos')
        ma_s16 AS (
          SELECT media_id, pos // 2 AS s,
                 SUM(b * (CASE WHEN (media_id = 4) = (pos % 2 = 0)
                               THEN 1 ELSE 256 END)) AS uv
          FROM ma_bytes WHERE media_id IN (4, 5)
          GROUP BY media_id, pos // 2
        ),
        ma_signed AS (
          SELECT media_id, s,
                 CASE WHEN uv >= 32768 THEN uv - 65536 ELSE uv END AS v
          FROM ma_s16
        ),
        ma_samples AS (
          -- clip 4 stereo: the WAV floor-of-mean fold
          SELECT media_id,
                 CAST(floor(SUM(v) / 2.0) AS BIGINT) AS v
          FROM ma_signed WHERE media_id = 4
          GROUP BY media_id, s // 2
          UNION ALL
          SELECT media_id, v FROM ma_signed WHERE media_id = 5
          UNION ALL
          SELECT media_id, b FROM ma_bytes WHERE media_id = 6
        )
        SELECT media_id, 'pcm' AS codec,
               CAST(COUNT(*) AS INTEGER) AS n_samples,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(v*v) AS BIGINT) AS px_sqsum
        FROM ma_samples
        GROUP BY media_id
        UNION ALL
        -- clip 7: 'ima4' compressed — count-only with NULL moments
        SELECT CAST(7 AS BIGINT), 'none', 120, NULL, NULL
        ORDER BY media_id
    """,
    "q231_jpeg_cmyk": """
        WITH ck_blocks AS (
          SELECT CAST(s.i AS BIGINT) AS media_id, u.j AS blk,
                 p.p AS plane,
                 16*(strpos('0123456789abcdef',
                      substr(md5(s.i || ':cmyk:' || p.p),
                             CAST(2*u.j+1 AS INT), 1))-1)
                   + (strpos('0123456789abcdef',
                      substr(md5(s.i || ':cmyk:' || p.p),
                             CAST(2*u.j+2 AS INT), 1))-1) AS v
          FROM (VALUES (0), (1), (2)) s(i), range(4) p(p),
               range(6) u(j)
        ),
        ck_pivot AS (
          SELECT media_id, blk,
                 MAX(CASE WHEN plane = 0 THEN v END) AS c,
                 MAX(CASE WHEN plane = 1 THEN v END) AS m,
                 MAX(CASE WHEN plane = 2 THEN v END) AS y,
                 MAX(CASE WHEN plane = 3 THEN v END) AS k
          FROM ck_blocks GROUP BY media_id, blk
        ),
        -- the pinned composite channel = stored_c * stored_k // 255
        -- (DuckDB // truncates; both factors are non-negative, so it
        -- equals the decoder's floor). Clip 1 is YCCK with flat
        -- chroma: stored c = m = y = the Y plane (plane 0).
        ck_rgb AS (
          SELECT media_id, blk,
                 (c*k)//255 AS r,
                 (CASE WHEN media_id = 1 THEN c ELSE m END * k)//255
                   AS g,
                 (CASE WHEN media_id = 1 THEN c ELSE y END * k)//255
                   AS b
          FROM ck_pivot
        )
        SELECT media_id,
               CAST(24 AS INTEGER) AS width,
               CAST(16 AS INTEGER) AS height,
               CAST(1 AS INTEGER) AS n_frames,
               CAST(3 AS INTEGER) AS channels,
               CAST(64 * SUM(r + g + b) AS BIGINT) AS px_sum,
               CAST(64 * SUM(r*r + g*g + b*b) AS BIGINT) AS px_sqsum
        FROM ck_rgb
        GROUP BY media_id
        UNION ALL
        -- clip 3: no APP14 — inversion unknowable, metadata-only
        SELECT CAST(3 AS BIGINT), 24, 16, 1, 0, NULL, NULL
        ORDER BY media_id
    """,
    "q221_gif_frames": f"""
        WITH {_GB_CTES},
        f8 AS (
          SELECT CAST(pos // 128 AS INT) AS frame_idx,
                 SUM(((b%64)*37)%256 + ((b%64)*59)%256
                     + ((b%64)*83)%256) AS s
          FROM gb_bytes WHERE media_id = 8
          GROUP BY pos // 128
        ),
        f9 AS (
          SELECT CAST(f AS INT) AS frame_idx,
                 SUM(CASE WHEN eff IS NULL THEN 0
                     ELSE ((eff*37)%256) + ((eff*59)%256)
                          + ((eff*83)%256) + 255 END) AS s
          FROM a9_eff GROUP BY f
        )
        SELECT CAST(8 AS BIGINT) AS media_id, frame_idx,
               CAST(s AS BIGINT) AS frame_px_sum
        FROM f8
        UNION ALL
        SELECT CAST(9 AS BIGINT), frame_idx, CAST(s AS BIGINT) FROM f9
        ORDER BY media_id, frame_idx
    """,
    "q225_avi_mjpeg": f"""
        WITH {_AVI_BLOCK_CTES}
        SELECT media_id,
               CAST({_JPEG_BW * 8} AS INTEGER) AS width,
               CAST({_JPEG_BH * 8} AS INTEGER) AS height,
               CAST(nf AS INTEGER) AS n_frames,
               CAST(ch AS INTEGER) AS channels,
               CAST(ch * 64 * SUM(v) AS BIGINT) AS px_sum,
               CAST(ch * 64 * SUM(v*v) AS BIGINT) AS px_sqsum
        FROM avi_blocks
        GROUP BY media_id, nf, ch
        UNION ALL
        -- clip 5: fourcc XVID, valid-unsupported — header metadata
        -- (dims + declared frame count) with NULL moments
        SELECT CAST(5 AS BIGINT), {_JPEG_BW * 8}, {_JPEG_BH * 8},
               3, 0, NULL, NULL
        UNION ALL
        SELECT media_id, {_JPEG_BW * 8}, {_JPEG_BH * 8}, 2, 3,
               CAST(SUM(v) AS BIGINT), CAST(SUM(v*v) AS BIGINT)
        FROM avi_dib GROUP BY media_id
        ORDER BY media_id
    """,
    "q226_avi_frames": f"""
        WITH {_AVI_BLOCK_CTES}
        SELECT media_id, frame AS frame_idx,
               CAST(ch * 64 * SUM(v) AS BIGINT) AS frame_px_sum
        FROM avi_blocks
        WHERE frame % 2 = 0
        GROUP BY media_id, frame, ch
        UNION ALL
        SELECT media_id, frame, CAST(SUM(v) AS BIGINT)
        FROM avi_dib WHERE frame % 2 = 0
        GROUP BY media_id, frame
        ORDER BY media_id, frame_idx
    """,
    # r12: the video dHash replayed from the md5 seeds — 8x9 luma
    # gather (rows 2*yy, cols (xx*24)//9), gradient bits, MSB-first
    # hex packing. Mosaic clips gather the block constant at
    # (ry//8, cx//8) (gray and gray-valued RGB both reduce to v:
    # (299+587+114)*v//1000 == v); DIB clips compute exact Rec.601
    # luma from the three expanded bytes at (ry*24+cx)*3.
    "q227_video_dhash": f"""
        WITH {_AVI_BLOCK_CTES},
        {_AVI_DHASH_CTES}
        SELECT media_id, CAST(frame AS INT) AS frame_idx, dhash
        FROM avi_hexes
        ORDER BY media_id, frame_idx
    """,
    "q228_video_neardup": f"""
        WITH {_AVI_BLOCK_CTES},
        {_AVI_DHASH_CTES},
        vcounts AS (
          SELECT media_id, COUNT(*) AS nfh FROM avi_hexes
          GROUP BY media_id
        ),
        vmatch AS (
          SELECT a.media_id AS id_a, b.media_id AS id_b,
                 COUNT(*) AS n_match
          FROM avi_hexes a JOIN avi_hexes b
            ON a.frame = b.frame AND a.dhash = b.dhash
           AND a.media_id < b.media_id
          GROUP BY a.media_id, b.media_id
        )
        SELECT m.id_a, m.id_b, CAST(m.n_match AS BIGINT) AS n_match,
               CAST(ca.nfh AS BIGINT) AS n_a,
               CAST(cb.nfh AS BIGINT) AS n_b
        FROM vmatch m
        JOIN vcounts ca ON ca.media_id = m.id_a
        JOIN vcounts cb ON cb.media_id = m.id_b
        WHERE 2 * m.n_match >= LEAST(ca.nfh, cb.nfh)
        ORDER BY id_a, id_b
    """,
    # r12: the planted AVI audio streams replayed from the md5 seeds —
    # clip 0: 256 int16-LE mono samples ('0:aviau:{chunk}' bytes, two
    # bytes per sample, sign via the high byte); clip 6: 300 8-bit
    # stereo frames folded (l+r)//2
    "q229_avi_audio": """
        WITH au0 AS (
          SELECT CAST(k.c*16 + g.j AS INT) AS pos,
                 16*(strpos('0123456789abcdef',
                      substr(md5('0:aviau:' || k.c),
                             CAST(2*g.j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5('0:aviau:' || k.c),
                             CAST(2*g.j+2 AS INT), 1))-1) AS v
          FROM range(32) k(c), range(16) g(j)
        ),
        s0 AS (
          SELECT lo.pos // 2 AS i,
                 lo.v + 256*hi.v
                 - CASE WHEN hi.v >= 128 THEN 65536 ELSE 0 END AS s
          FROM au0 lo JOIN au0 hi ON hi.pos = lo.pos + 1
          WHERE lo.pos % 2 = 0
        ),
        au6 AS (
          SELECT CAST(k.c*16 + g.j AS INT) AS pos,
                 16*(strpos('0123456789abcdef',
                      substr(md5('6:aviau:' || k.c),
                             CAST(2*g.j+1 AS INT), 1))-1)
                 + (strpos('0123456789abcdef',
                      substr(md5('6:aviau:' || k.c),
                             CAST(2*g.j+2 AS INT), 1))-1) AS v
          FROM range(38) k(c), range(16) g(j)
          WHERE k.c*16 + g.j < 600
        ),
        s6 AS (
          SELECT l.pos // 2 AS i, (l.v + r.v) // 2 AS s
          FROM au6 l JOIN au6 r ON r.pos = l.pos + 1
          WHERE l.pos % 2 = 0
        )
        SELECT CAST(0 AS BIGINT) AS media_id, 'pcm' AS codec,
               CAST(256 AS INT) AS n_samples,
               CAST(SUM(s) AS BIGINT) AS px_sum,
               CAST(SUM(s*s) AS BIGINT) AS px_sqsum
        FROM s0
        UNION ALL
        SELECT CAST(6 AS BIGINT), 'pcm', 300,
               CAST(SUM(s) AS BIGINT), CAST(SUM(s*s) AS BIGINT)
        FROM s6
        ORDER BY media_id
    """,
    "q206_png16_native": f"""
        WITH {_PNG16_CTE}
        SELECT media_id,
               CAST({_PNG_W} AS INTEGER) AS width,
               CAST({_PNG_H} AS INTEGER) AS height,
               CAST(ch AS INTEGER) AS channels,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(v*v) AS BIGINT) AS px_sqsum
        FROM p16_samples
        GROUP BY media_id, ch
        UNION ALL
        SELECT media_id,
               CAST({_PNG_W} AS INTEGER) AS width,
               CAST({_PNG_H} AS INTEGER) AS height,
               CAST(ch AS INTEGER) AS channels,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(v*v) AS BIGINT) AS px_sqsum
        FROM p16t_samples
        GROUP BY media_id, ch
        ORDER BY media_id
    """,
    "q209_audio_fingerprint": f"""
        WITH {_AHASH_CTES}
        SELECT media_id, ahash FROM ahashes ORDER BY media_id
    """,
    "q210_audio_neardup": f"""
        WITH {_AHASH_CTES},
        abanded AS (
          SELECT media_id, ahash, CAST(k.j AS INT) AS band,
                 substr(ahash, CAST(k.j*2 + 1 AS INT), 2) AS bucket
          FROM ahashes CROSS JOIN range(4) k(j)
        ),
        acand AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                 a.ahash AS ha, b.ahash AS hb
          FROM abanded a
          JOIN abanded b ON a.band = b.band AND a.bucket = b.bucket
                         AND a.media_id < b.media_id
        ),
        aham AS (
          SELECT id_a, id_b,
                 SUM(bit_count(xor(
                   strpos('0123456789abcdef',
                          substr(ha, CAST(j.n + 1 AS INT), 1)) - 1,
                   strpos('0123456789abcdef',
                          substr(hb, CAST(j.n + 1 AS INT), 1)) - 1))) AS hamming
          FROM acand CROSS JOIN range(8) j(n)
          GROUP BY id_a, id_b
        )
        SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
        FROM aham WHERE hamming <= 8 ORDER BY id_a, id_b
    """,
    "q82_image_neardup": f"""
        WITH {_DHASH_CTES},
        banded AS (
          SELECT media_id, dhash, CAST(k.j AS INT) AS band,
                 substr(dhash, CAST(k.j*4 + 1 AS INT), 4) AS bucket
          FROM hashes CROSS JOIN range(4) k(j)
        ),
        cand AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                 a.dhash AS ha, b.dhash AS hb
          FROM banded a
          JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.media_id < b.media_id
        ),
        ham AS (
          SELECT id_a, id_b,
                 SUM(bit_count(xor(
                   strpos('0123456789abcdef',
                          substr(ha, CAST(j.n + 1 AS INT), 1)) - 1,
                   strpos('0123456789abcdef',
                          substr(hb, CAST(j.n + 1 AS INT), 1)) - 1))) AS hamming
          FROM cand CROSS JOIN range(16) j(n)
          GROUP BY id_a, id_b
        )
        SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
        FROM ham WHERE hamming <= 10 ORDER BY id_a, id_b
    """,
}
