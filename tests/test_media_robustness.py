"""Corrupt-bitstream robustness (r7 verdict item 5): mutated or
truncated PNG/JPEG/WAV payloads must RAISE (or land a quarantine /
metadata-only row) — never silently emit wrong pixels — applying the
reference's malformed-record discipline (README.md:8-13, bad CSV
records route to a dead-letter file) to the media decoders.

The PNG invariant is the strong one: every chunk's CRC32 is verified,
scanline counts are length-checked against the header, and filter
bytes are range-checked — so for EVERY single-byte mutation the decode
either errors or returns pixels IDENTICAL to the original (the only
silent-success positions are bytes the spec says to ignore, e.g.
trailing garbage after IEND). WAV carries no checksums, so its pinned
surface is structural: truncations and length-field corruption raise;
sample-byte flips legitimately decode to different samples (true of
any RIFF reader). JPEG (no CRC either): structural corruption must
never escape decode_media as a task-killing exception.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dataingestiontohana_spark.operators.multimodal import (
    _CORRUPT_ERRORS,
    KIND_AUDIO,
    KIND_IMAGE,
    _decode_payload,
    _parse_png,
    _parse_wav,
    decode_media,
    encode_png,
)


def _wav_pcm(samples_bytes: bytes, channels: int, bits: int) -> bytes:
    width = bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, 8000, 8000 * width * channels,
                      width * channels, bits)
    return (b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(samples_bytes))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples_bytes)) + samples_bytes)


def _decode_or_outcome(payload: bytes):
    """-> ('pixels', px) | ('metadata', None) | ('error', exc_name).
    NotImplementedError (unrecognized container after a magic-breaking
    mutation) counts as an error outcome: the row is refused, loudly."""
    try:
        _w, _h, _nf, ch, px = _decode_payload(payload)
    except (*_CORRUPT_ERRORS, NotImplementedError) as ex:
        return "error", type(ex).__name__
    if px is None:
        return "metadata", None
    return "pixels", px


def test_png_every_single_byte_mutation_errors_or_roundtrips():
    """Exhaustive single-byte corruption of a real PNG: each position
    XOR-flipped; the decode must error (CRC/structure) or reproduce
    the ORIGINAL pixels bit-exactly (ignorable region). Run over a
    filter-mixed RGB image and an Adam7 grayscale-alpha image so both
    scanline layouts are covered."""
    rng = np.random.default_rng(41)
    cases = [
        encode_png(
            rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8), 2,
            filters=(0, 1, 2, 3, 4),
        ),
        encode_png(
            rng.integers(0, 256, size=(7, 5, 2), dtype=np.uint8), 4,
            filters=(4, 3, 2, 1, 0), interlace=1,
        ),
    ]
    for png in cases:
        want = _parse_png(png)[3]
        silent_wrong = []
        outcomes = {"error": 0, "metadata": 0, "pixels": 0}
        for i in range(len(png)):
            mutated = bytearray(png)
            mutated[i] ^= 0x5A
            kind, val = _decode_or_outcome(bytes(mutated))
            outcomes[kind] += 1
            if kind == "pixels" and not np.array_equal(val, want):
                silent_wrong.append(i)
        assert silent_wrong == [], (
            f"positions decoding to WRONG pixels with no error: "
            f"{silent_wrong[:10]} (of {len(png)} bytes)"
        )
        # the suite is only meaningful if corruption is actually being
        # caught (not everything falling into the metadata bucket)
        assert outcomes["error"] > len(png) * 0.5


def test_png_every_truncation_refuses_stats():
    rng = np.random.default_rng(43)
    png = encode_png(
        rng.integers(0, 256, size=(9, 4), dtype=np.uint8), 0,
        filters=(1, 2, 3, 4, 0),
    )
    for cut in range(len(png)):  # every proper prefix
        kind, _ = _decode_or_outcome(png[:cut])
        assert kind in ("error", "metadata"), f"prefix {cut} produced pixels"


def test_png_forged_header_and_filter_bytes_raise():
    import zlib

    rng = np.random.default_rng(47)
    arr = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    png = bytearray(encode_png(arr, 0))

    def _reseal_ihdr(b: bytearray) -> bytes:
        data = bytes(b[12:16]) + bytes(b[16 : 16 + 13])
        crc = zlib.crc32(data) & 0xFFFFFFFF
        b[16 + 13 : 16 + 17] = struct.pack(">I", crc)
        return bytes(b)

    # a forged (CRC-resealed) height: scanline count no longer matches
    # the inflated byte length -> the exact-length check must fire
    forged = bytearray(png)
    forged[20:24] = struct.pack(">I", 7)  # height 6 -> 7
    with pytest.raises(ValueError, match="truncated scanline|inflated size"):
        _parse_png(_reseal_ihdr(forged))

    # a forged implausible width must refuse BEFORE allocating
    huge = bytearray(png)
    huge[16:20] = struct.pack(">I", 1 << 30)
    with pytest.raises(ValueError, match="implausible decode size"):
        _parse_png(_reseal_ihdr(huge))

    # an illegal filter byte (5..255) must raise, never decode-as-Paeth
    raw = bytearray(b"\x07" + bytes(6))  # filter 7 on row 0
    for _ in range(5):
        raw += b"\x00" + bytes(6)
    body = zlib.compress(bytes(raw))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 6, 6, 8, 0, 0, 0, 0)
    evil = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="illegal filter type"):
        _parse_png(evil)


def test_wav_truncations_and_length_corruption_raise():
    rng = np.random.default_rng(53)
    v = rng.integers(-(1 << 15), 1 << 15, size=32, dtype=np.int64)
    wav = _wav_pcm(v.astype("<i2").tobytes(), 1, 16)

    # every truncation that cuts into a declared chunk must raise
    # (shorter than the 12-byte RIFF header isn't WAV at all ->
    # NotImplementedError via the container dispatch)
    for cut in range(12, len(wav)):
        kind, _ = _decode_or_outcome(wav[:cut])
        assert kind == "error", f"prefix {cut} did not error"

    # corrupting the data chunk's declared length past EOF
    at = wav.index(b"data") + 4
    bad = bytearray(wav)
    bad[at:at + 4] = struct.pack("<I", len(wav))  # way past the end
    with pytest.raises(ValueError, match="truncated"):
        _parse_wav(bytes(bad))

    # a data length that is not a whole number of frames
    bad2 = bytearray(wav)
    bad2[at:at + 4] = struct.pack("<I", 63)  # 63 bytes of 16-bit mono
    bad2 = bad2[: at + 4 + 63]
    with pytest.raises(ValueError, match="whole number of frames"):
        _parse_wav(bytes(bad2))

    # an illegal bits-per-sample (mutated fmt) must raise, never
    # compute a bogus sample count from a nonsense width
    fmt_at = wav.index(b"fmt ") + 8
    bad3 = bytearray(wav)
    bad3[fmt_at + 14 : fmt_at + 16] = struct.pack("<H", 12)
    with pytest.raises(ValueError, match="illegal PCM sample width"):
        _parse_wav(bytes(bad3))


def test_jpeg_mutations_never_escape_decode_payload():
    """JPEG has no integrity words, so mutated entropy bits may decode
    to different pixels — the pinned contract is weaker but absolute:
    no mutation or truncation may ESCAPE as an uncaught non-corrupt
    exception (task death); every outcome is pixels, metadata-only, or
    a _CORRUPT_ERRORS member that decode_media quarantines."""
    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(59)
    px = rng.integers(0, 256, size=16 * 16, dtype=np.uint8)
    jpg = encode_jpeg_baseline(px, 16, 16, 1)
    for i in range(2, len(jpg)):  # keep the SOI magic: stay on the JPEG path
        mutated = bytearray(jpg)
        mutated[i] ^= 0xA5
        kind, _ = _decode_or_outcome(bytes(mutated))
        assert kind in ("pixels", "metadata", "error")
    for cut in range(2, len(jpg)):
        kind, _ = _decode_or_outcome(jpg[:cut])
        assert kind in ("pixels", "metadata", "error")


def test_jpeg_cmyk_decodes_exactly_and_contracts_hold():
    """r12: Adobe 4-component JPEG. Constant-block mosaics at unit
    quantization decode EXACTLY under the pinned c*k//255 composite —
    transform-0 CMYK, transform-2 YCCK (flat chroma cancels the YCC
    conversion), interleaved AND the non-interleaved four-scan layout
    (bit-identical pixels). Contract edges: no APP14 -> metadata-only
    (the stored-value inversion is unknowable); transform 1 with four
    components -> metadata-only (illegal declaration)."""
    from dataingestiontohana_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        encode_jpeg_cmyk,
    )

    rng = np.random.default_rng(23)
    H, W = 16, 24

    def mosaic():
        vals = rng.integers(0, 256, size=(2, 3), dtype=np.uint8)
        return np.kron(vals, np.ones((8, 8), np.uint8))

    planes = [mosaic() for _ in range(4)]
    stored = np.stack(planes, axis=-1)
    px, ch = _decode_jpeg_pixels(
        encode_jpeg_cmyk(stored.reshape(-1), W, H, transform=0)
    )
    assert ch == 3
    c_, m_, y_, k_ = (p.astype(np.int64) for p in planes)
    want = np.stack(
        [c_ * k_ // 255, m_ * k_ // 255, y_ * k_ // 255], axis=-1
    ).astype(np.uint8)
    assert np.array_equal(px.reshape(H, W, 3), want)
    # non-interleaved layout: bit-identical pixels
    px_ni, _ = _decode_jpeg_pixels(
        encode_jpeg_cmyk(
            stored.reshape(-1), W, H, transform=0, non_interleaved=True
        )
    )
    assert np.array_equal(px_ni, px)
    # YCCK with flat chroma: stored c = m = y = Y exactly
    yv, kv = mosaic(), mosaic()
    flat = np.full_like(yv, 128)
    st2 = np.stack([yv, flat, flat, kv], axis=-1)
    px2, _ = _decode_jpeg_pixels(
        encode_jpeg_cmyk(st2.reshape(-1), W, H, transform=2)
    )
    yk = yv.astype(np.int64) * kv.astype(np.int64) // 255
    assert np.array_equal(
        px2.reshape(H, W, 3), np.stack([yk] * 3, axis=-1).astype(np.uint8)
    )
    # no APP14: metadata-only, never guessed pixels
    assert (
        _decode_jpeg_pixels(
            encode_jpeg_cmyk(stored.reshape(-1), W, H, app14=False)
        )
        is None
    )
    # APP14 transform=1 over 4 components: illegal -> metadata-only
    bad = bytearray(encode_jpeg_cmyk(stored.reshape(-1), W, H))
    at = bad.find(b"Adobe")
    bad[at + 11] = 1
    assert _decode_jpeg_pixels(bytes(bad)) is None


def test_jpeg_cmyk_mutations_never_escape():
    """The JPEG mutation contract extended to the 4-component path:
    every single-byte mutation and truncation of a CMYK stream lands
    in pixels / metadata / caught-error."""
    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_cmyk,
    )

    rng = np.random.default_rng(31)
    stored = rng.integers(0, 256, size=16 * 16 * 4, dtype=np.uint8)
    jpg = encode_jpeg_cmyk(stored, 16, 16, transform=0)
    for i in range(2, len(jpg)):
        mutated = bytearray(jpg)
        mutated[i] ^= 0xA5
        kind, _ = _decode_or_outcome(bytes(mutated))
        assert kind in ("pixels", "metadata", "error")
    for cut in range(2, len(jpg)):
        kind, _ = _decode_or_outcome(jpg[:cut])
        assert kind in ("pixels", "metadata", "error")


def test_decode_media_quarantines_corrupt_rows(spark):
    """End-to-end: one Spark batch holding valid AND corrupted blobs
    completes; corrupt rows carry decode_error with nulled stats,
    valid rows' moments are untouched."""
    rng = np.random.default_rng(61)
    arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    good_png = encode_png(arr, 2)
    bad_png = bytearray(good_png)
    bad_png[len(bad_png) // 2] ^= 0xFF  # CRC break inside IDAT
    v = rng.integers(-(1 << 15), 1 << 15, size=16, dtype=np.int64)
    good_wav = _wav_pcm(v.astype("<i2").tobytes(), 1, 16)
    bad_wav = good_wav[: len(good_wav) - 3]  # truncated data chunk

    df = spark.createDataFrame(
        [
            (1, KIND_IMAGE, good_png),
            (2, KIND_IMAGE, bytes(bad_png)),
            (3, KIND_AUDIO, good_wav),
            (4, KIND_AUDIO, bad_wav),
        ],
        "media_id long, kind int, content binary",
    ).coalesce(1)
    got = {r["media_id"]: r for r in decode_media(df).collect()}
    assert got[1]["decode_error"] is None
    assert got[1]["px_sum"] == int(arr.astype(np.int64).sum())
    assert got[2]["decode_error"] and got[2]["px_sum"] is None
    assert got[2]["width"] is None  # quarantine row: metadata nulled
    assert got[3]["decode_error"] is None
    assert got[3]["px_sum"] == int(v.sum())
    assert got[4]["decode_error"] and got[4]["px_sum"] is None


def test_png_trns_mutation_suite():
    """r8 verdict item 8 follow-through: the mutation discipline
    extends to tRNS-carrying streams — every single-byte flip of a
    palette-alpha PNG and a gray-keyed PNG errors (CRC/structure) or
    reproduces the ORIGINAL RGBA/gray+alpha pixels bit-exactly; no
    mutation silently changes transparency."""
    rng = np.random.default_rng(42)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    cases = [
        encode_png(
            rng.integers(0, 16, size=(6, 5), dtype=np.uint8), 3,
            filters=(0, 1, 2, 3, 4), palette=pal,
            trns=bytes(rng.integers(0, 256, size=16, dtype=np.uint8)),
        ),
        encode_png(
            rng.integers(0, 256, size=(5, 7), dtype=np.uint8), 0,
            filters=(2, 4), trns=77, interlace=1,
        ),
    ]
    for png in cases:
        want = _parse_png(png)[3]
        silent_wrong = []
        outcomes = {"error": 0, "metadata": 0, "pixels": 0}
        for i in range(len(png)):
            mutated = bytearray(png)
            mutated[i] ^= 0x5A
            kind, val = _decode_or_outcome(bytes(mutated))
            outcomes[kind] += 1
            if kind == "pixels" and not np.array_equal(val, want):
                silent_wrong.append(i)
        assert silent_wrong == [], silent_wrong[:10]
        assert outcomes["error"] > len(png) * 0.5


def test_png_trns_shape_violations_are_corrupt():
    """Spec-illegal tRNS shapes are corrupt bitstreams, not layouts:
    wrong key width for gray/RGB, longer than the palette, or present
    on an alpha-bearing color type."""
    import struct as _s
    import zlib as _z

    import pytest

    def with_trns(png: bytes, tdata: bytes) -> bytes:
        i = png.index(b"IDAT") - 4
        chunk = (_s.pack(">I", len(tdata)) + b"tRNS" + tdata
                 + _s.pack(">I", _z.crc32(b"tRNS" + tdata)))
        return png[:i] + chunk + png[i:]

    gray = encode_png(np.zeros((2, 2), np.uint8), 0)
    with pytest.raises(ValueError, match="2 bytes"):
        _parse_png(with_trns(gray, b"\x01"))
    rgb = encode_png(np.zeros((2, 2, 3), np.uint8), 2)
    with pytest.raises(ValueError, match="6 bytes"):
        _parse_png(with_trns(rgb, b"\x00\x01"))
    pal = np.zeros((4, 3), np.uint8)
    palpng = encode_png(np.zeros((2, 2), np.uint8), 3, palette=pal)
    with pytest.raises(ValueError, match="longer than the palette"):
        _parse_png(with_trns(palpng, bytes(5)))
    rgba = encode_png(np.zeros((2, 2, 4), np.uint8), 6)
    with pytest.raises(ValueError, match="forbidden"):
        _parse_png(with_trns(rgba, b"\x00\x00"))


def test_png_gama_chunk_skipped_but_crc_enforced():
    """gAMA is presentation metadata: its presence must not change the
    decoded samples (a gamma-applying decoder would desync every
    integer oracle), but its CRC is still validated — a corrupted
    ancillary chunk quarantines like any other mutation."""
    import struct as _s
    import zlib as _z

    rng = np.random.default_rng(43)
    arr = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    plain = encode_png(arr, 2)
    gama = _s.pack(">I", 45455)
    chunk = (_s.pack(">I", 4) + b"gAMA" + gama
             + _s.pack(">I", _z.crc32(b"gAMA" + gama)))
    i = plain.index(b"IDAT") - 4
    with_gama = plain[:i] + chunk + plain[i:]
    assert np.array_equal(_parse_png(with_gama)[3], _parse_png(plain)[3])
    # corrupt the gAMA payload: CRC validation must catch it
    bad = bytearray(with_gama)
    bad[i + 8] ^= 0xFF
    kind, _ = _decode_or_outcome(bytes(bad))
    assert kind == "error"


def test_ms_adpcm_and_subset_jpeg_mutations_never_escape():
    """r11 mutation coverage for the round's new decode paths: every
    single-byte mutation and truncation of (a) an MS-ADPCM WAV and
    (b) a partial-subset arithmetic JPEG must land on the pinned
    outcome set — samples/pixels, metadata-only, or a quarantined
    corrupt error. Never an uncaught exception."""
    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import (
        _MS_ADPCM_COEF1,
        _MS_ADPCM_COEF2,
        encode_jpeg_arith,
    )

    # MS-ADPCM: one stereo block + a partial tail
    hdr = (bytes([0, 3]) + struct.pack("<hh", 16, 40)
           + struct.pack("<hh", 100, -5) + struct.pack("<hh", -5000, -6))
    data = hdr + bytes([0x17, 0x9F, 0x80, 0x31]) + hdr + bytes([0x2C, 0x4D])
    fmt = struct.pack("<HHIIHHHHH", 2, 2, 8000, 4000, 18, 4, 32, 6, 7)
    fmt += b"".join(struct.pack("<hh", a, b)
                    for a, b in zip(_MS_ADPCM_COEF1, _MS_ADPCM_COEF2))
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    for i in range(4, len(wav)):
        mutated = bytearray(wav)
        mutated[i] ^= 0xA5
        kind, _ = _decode_or_outcome(bytes(mutated))
        assert kind in ("pixels", "metadata", "error"), i
    for cut in range(12, len(wav)):
        kind, _ = _decode_or_outcome(wav[:cut])
        assert kind in ("pixels", "metadata", "error"), cut

    # partial-subset arithmetic JPEG with restarts
    rng = np.random.default_rng(61)
    px = rng.integers(0, 256, size=16 * 16 * 3, dtype=np.uint8)
    jpg = encode_jpeg_arith(px, 16, 16, 3, scan_groups=[[1, 2], [3]],
                            restart_interval=2)
    for i in range(2, len(jpg)):
        mutated = bytearray(jpg)
        mutated[i] ^= 0xA5
        kind, _ = _decode_or_outcome(bytes(mutated))
        assert kind in ("pixels", "metadata", "error"), i
    for cut in range(2, len(jpg)):
        kind, _ = _decode_or_outcome(jpg[:cut])
        assert kind in ("pixels", "metadata", "error"), cut


def test_avi_mutations_and_truncations_never_escape():
    """r12 mutation coverage for the AVI/MJPEG container: every
    single-byte mutation and every truncation of a 2-frame MJPEG AVI
    (baseline + restart frames, idx1 included) must land on the
    pinned outcome set — pixels, metadata-only, or a quarantined
    corrupt error. Never an uncaught exception."""
    import hashlib

    from dataingestiontohana_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_baseline,
    )

    ones = np.ones(64)
    g = np.zeros((16, 24), np.uint8)
    for j, v in enumerate(hashlib.md5(b"avi-sweep").digest()[:6]):
        by, bx = divmod(j, 3)
        g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    px = g.reshape(-1)
    frames = [
        encode_jpeg_baseline(px, 24, 16, 1, quant_luma=ones),
        encode_jpeg_baseline(px, 24, 16, 1, quant_luma=ones,
                             restart_interval=2),
    ]
    avi = encode_avi_mjpeg(frames, 24, 16)
    for i in range(4, len(avi)):
        mutated = bytearray(avi)
        mutated[i] ^= 0xA5
        kind, _ = _decode_or_outcome(bytes(mutated))
        assert kind in ("pixels", "metadata", "error"), i
    for cut in range(len(avi)):
        kind, _ = _decode_or_outcome(avi[:cut])
        assert kind in ("pixels", "metadata", "error"), cut


def test_mov_mutations_and_truncations_never_escape():
    """r12 mutation coverage for the QuickTime/MOV container: every
    single-byte mutation and every truncation of a 2-sample MJPEG
    movie (real moov/trak/stbl tables) must land on the pinned
    outcome set — pixels, metadata-only, or a quarantined corrupt
    error. Never an uncaught exception."""
    import hashlib

    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_baseline,
        encode_mov_mjpeg,
    )

    ones = np.ones(64)
    g = np.zeros((16, 24), np.uint8)
    for j, v in enumerate(hashlib.md5(b"mov-sweep").digest()[:6]):
        by, bx = divmod(j, 3)
        g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    px = g.reshape(-1)
    jpg = encode_jpeg_baseline(px, 24, 16, 1, quant_luma=ones)
    mov = encode_mov_mjpeg([jpg, jpg], 24, 16)
    for i in range(len(mov)):
        mutated = bytearray(mov)
        mutated[i] ^= 0xA5
        kind, _ = _decode_or_outcome(bytes(mutated))
        assert kind in ("pixels", "metadata", "error"), i
    for cut in range(len(mov)):
        kind, _ = _decode_or_outcome(mov[:cut])
        assert kind in ("pixels", "metadata", "error"), cut


def test_decode_media_quarantines_corrupt_avi(spark):
    """A corrupt AVI (frame-count mismatch) lands a quarantine row
    through the full Spark decode_media path — the stream/batch never
    dies on one bad clip — while a sibling good clip decodes."""
    import hashlib
    import struct as _s

    from dataingestiontohana_spark.operators.multimodal import (
        KIND_VIDEO,
        encode_avi_mjpeg,
        encode_jpeg_baseline,
    )

    ones = np.ones(64)
    g = np.zeros((16, 24), np.uint8)
    for j, v in enumerate(hashlib.md5(b"avi-q").digest()[:6]):
        by, bx = divmod(j, 3)
        g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    jpg = encode_jpeg_baseline(g.reshape(-1), 24, 16, 1, quant_luma=ones)
    good = encode_avi_mjpeg([jpg, jpg], 24, 16)
    bad = bytearray(good)
    at = good.find(b"avih") + 8 + 16
    bad[at : at + 4] = _s.pack("<I", 7)  # declares 7 frames, movi has 2
    df = spark.createDataFrame(
        [(1, KIND_VIDEO, bytearray(good)), (2, KIND_VIDEO, bad)],
        "media_id long, kind int, content binary",
    ).coalesce(1)
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert rows[1]["decode_error"] is None and rows[1]["n_frames"] == 2
    assert rows[1]["px_sum"] == 2 * 64 * int(
        np.int64(0) + sum(hashlib.md5(b"avi-q").digest()[:6])
    )
    assert rows[2]["decode_error"] is not None
    assert "frames" in rows[2]["decode_error"]


def test_subsampled_lossless_mutations_never_escape():
    """r12: every single-byte mutation and truncation of a subsampled
    lossless stream lands on the pinned outcome set — pixels,
    metadata-only, or a quarantined error. Never an uncaught
    exception."""
    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(63)
    blob = encode_jpeg_lossless(
        [rng.integers(0, 256, size=(8, 12), dtype=np.uint8),
         rng.integers(0, 256, size=(4, 6), dtype=np.uint8)],
        predictor=4, sampling=[(2, 2), (1, 1)])
    for i in range(2, len(blob)):
        mutated = bytearray(blob)
        mutated[i] ^= 0xA5
        kind, _ = _decode_or_outcome(bytes(mutated))
        assert kind in ("pixels", "metadata", "error"), i
    for cut in range(2, len(blob)):
        kind, _ = _decode_or_outcome(blob[:cut])
        assert kind in ("pixels", "metadata", "error"), cut
