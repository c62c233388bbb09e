"""Lossless JPEG (SOF3, T.81 Annex H — r10, closing the last
Huffman-JPEG boundary): exact round trips through the matching
pure-stdlib encoder (lossless means decode(encode(x)) == x BIT-EXACTLY
— the strongest pin available, the GIF discipline applied where no
third-party generator exists: libjpeg-turbo 2.x cannot emit SOF3), a
HAND-ASSEMBLED spec-derived stream built byte-by-byte from the T.81
rules (independent of the encoder), and the restriction/corruption
contracts."""

from __future__ import annotations

import numpy as np
import pytest

from dataingestiontohana_spark.operators.multimodal import (
    _decode_jpeg_pixels,
    _parse_jpeg,
    encode_jpeg_lossless,
)


def test_round_trip_all_predictors_shapes_precisions():
    """decode(encode(x)) must reproduce x bit-exactly for every
    predictor 1-7, gray and 3-component, odd sizes, and 8/12/16-bit
    precision (uint16 output above 8, the PNG16 convention)."""
    rng = np.random.default_rng(104)
    for pred in range(1, 8):
        for shape, prec in (
            ((8, 16), 8), ((7, 9), 8), ((1, 1), 8), ((1, 5), 8),
            ((5, 1), 8), ((5, 5), 16), ((8, 16, 3), 8), ((6, 4, 3), 12),
        ):
            hi = 1 << prec
            a = rng.integers(0, hi, size=shape).astype(
                np.uint16 if prec > 8 else np.uint8
            )
            blob = encode_jpeg_lossless(a, predictor=pred, precision=prec)
            got = _decode_jpeg_pixels(blob)
            assert got is not None, (pred, shape, prec)
            px, ch = got
            nc = shape[2] if len(shape) == 3 else 1
            assert ch == nc
            assert px.dtype == (np.uint16 if prec > 8 else np.uint8)
            assert np.array_equal(
                px.reshape(shape[0], shape[1], nc).astype(np.int64),
                a.reshape(shape[0], shape[1], nc).astype(np.int64),
            ), (pred, shape, prec)
            # metadata walk sees the SOF3 dimensions
            assert _parse_jpeg(blob) == (shape[1], shape[0])


def test_hand_assembled_spec_stream_decodes():
    """A 2x2 grayscale SOF3 stream assembled BYTE-BY-BYTE from the
    T.81 rules (not via the encoder): predictor 1, pixels
    [[100, 101], [99, 98]]. Derivation: the Huffman table gives every
    category a 5-bit code equal to its value (counts[len=5] = 17,
    values 0..16 — canonical C.2 assignment). Sample walk:
    (0,0) pred = 2^(8-1) = 128, diff = -28 -> SSSS 5, bits -28+31 = 3;
    (0,1) first line uses Ra = 100, diff = +1 -> SSSS 1, bit 1;
    (1,0) line start uses Rb = 100, diff = -1 -> SSSS 1, bit 0;
    (1,1) predictor 1 Ra = 99,      diff = -1 -> SSSS 1, bit 0.
    Entropy bits: 00101 00011 00001 1 00001 0 00001 0 + 1-padding
    = 0x28 0xC3 0x08 0x2F."""
    dht = (
        b"\xff\xc4" + (2 + 17 + 17).to_bytes(2, "big") + b"\x00"
        + bytes([0, 0, 0, 0, 17] + [0] * 11) + bytes(range(17))
    )
    sof = b"\xff\xc3\x00\x0b" + bytes((8,)) + (2).to_bytes(2, "big") \
        + (2).to_bytes(2, "big") + bytes((1, 1, 0x11, 0))
    sos = b"\xff\xda\x00\x08" + bytes((1, 1, 0x00, 1, 0, 0))
    blob = (b"\xff\xd8" + dht + sof + sos
            + bytes((0x28, 0xC3, 0x08, 0x2F)) + b"\xff\xd9")
    got = _decode_jpeg_pixels(blob)
    assert got is not None
    px, ch = got
    assert ch == 1 and px.tolist() == [100, 101, 99, 98]


def test_modulo_wrap_and_category_16():
    """16-bit samples whose differences wrap modulo 2^16 — including
    the diff = 32768 case that encodes as category 16 with NO
    magnitude bits — must round-trip exactly."""
    a = np.array([[0, 32768], [65535, 1]], np.uint16)
    for pred in (1, 2, 4, 7):
        px, ch = _decode_jpeg_pixels(
            encode_jpeg_lossless(a, predictor=pred, precision=16)
        )
        assert ch == 1 and px.reshape(2, 2).tolist() == a.tolist()


def test_restrictions_and_corruption_contract():
    """Legal-but-exotic shapes fall to metadata-only (None), never
    wrong pixels; structural violations raise."""
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    good = bytearray(encode_jpeg_lossless(a, predictor=4))

    def _find(marker: int) -> int:
        i = good.find(bytes((0xFF, marker)))
        assert i >= 0
        return i

    # point transform decodes since r11: relabeling Al on an
    # existing stream is wrong-but-plausible (no CRC) — it must
    # decode DETERMINISTICALLY in the downshifted domain, never crash
    pt = bytearray(good)
    pt[_find(0xDA) + 9] = 0x02  # AhAl byte of the 1-comp SOS
    got1 = _decode_jpeg_pixels(bytes(pt))
    got2 = _decode_jpeg_pixels(bytes(pt))
    assert got1 is not None and np.array_equal(got1[0], got2[0])
    assert int(got1[0].max()) % 4 == 0 or int(got1[0].max()) == 0
    # subsampled lossless DECODES since r12 (whole-MCU grids):
    # relabeling the sampling byte on an existing stream is another
    # wrong-but-plausible no-CRC mutation — it must decode
    # DETERMINISTICALLY (the same bits walked in A.2.4 MCU order),
    # never crash
    sub = bytearray(good)
    sub[_find(0xC3) + 11] = 0x22  # h/v sampling of component 1
    s1 = _decode_jpeg_pixels(bytes(sub))
    s2 = _decode_jpeg_pixels(bytes(sub))
    assert s1 is not None and np.array_equal(s1[0], s2[0])
    # ...but a PARTIAL-MCU grid (4x4 at V=3) is the remaining
    # metadata-only residue
    rag = bytearray(good)
    rag[_find(0xC3) + 11] = 0x33
    rag2 = bytearray(rag)
    rag2[_find(0xC3) + 11] = 0x23
    assert _decode_jpeg_pixels(bytes(rag2)) is None
    # DRI before the scan: MID-LINE restart (2 MCUs inside a 4-wide
    # line) stays metadata-only — the remaining restart residue; a
    # ROW-ALIGNED DRI decodes since r12 (own test module section)
    sos_at = _find(0xDA)
    dri = bytes((0xFF, 0xDD, 0x00, 0x04, 0x00, 0x02))
    withdri = bytes(good[:sos_at]) + dri + bytes(good[sos_at:])
    assert _decode_jpeg_pixels(withdri) is None
    # predictor 0 (reserved for hierarchical differential): corrupt
    p0 = bytearray(good)
    p0[_find(0xDA) + 7] = 0  # Ss byte
    with pytest.raises(ValueError, match="predictor"):
        _decode_jpeg_pixels(bytes(p0))
    # precision outside 2-16: corrupt
    bad_p = bytearray(good)
    bad_p[_find(0xC3) + 4] = 17
    with pytest.raises(ValueError, match="precision"):
        _decode_jpeg_pixels(bytes(bad_p))


def test_decode_media_routes_lossless(spark):
    """The full operator path: a lossless clip lands real pixel
    moments (not a metadata-only row, not a quarantine row)."""
    from dataingestiontohana_spark.operators.multimodal import (
        KIND_IMAGE,
        decode_media,
    )

    rng = np.random.default_rng(105)
    a = rng.integers(0, 256, size=(8, 16), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, KIND_IMAGE, encode_jpeg_lossless(a, predictor=6))],
        "media_id long, kind int, content binary",
    ).coalesce(1)
    row = decode_media(df).collect()[0]
    assert row["decode_error"] is None
    assert row["channels"] == 1
    assert row["px_sum"] == int(a.astype(np.int64).sum())
    assert row["px_sqsum"] == int((a.astype(np.int64) ** 2).sum())


def test_point_transform_round_trips_and_hand_pin():
    """r11: lossless POINT TRANSFORM (Al = Pt > 0, T.81 H.1) —
    samples code in the downshifted (P-Pt)-bit domain with prediction
    default 2^(P-Pt-1) and reconstruct as value << Pt, so the
    round-trip law is decode(encode(x, pt)) == (x >> pt) << pt.
    Pinned two ways: the law over predictors/precisions, and a
    HAND-ASSEMBLED 2x2 stream (predictor 1, Pt=1, pixels
    [[100,101],[99,98]] -> downshifted [[50,50],[49,49]]):
    (0,0) pred 2^(8-1-1)=64, diff -14 -> SSSS 4, bits -14+15=0001;
    (0,1) Ra=50, diff 0 -> SSSS 0; (1,0) Rb=50, diff -1 -> SSSS 1,
    bit 0; (1,1) Ra=49, diff 0 -> SSSS 0. Bit string 00100 0001
    00000 00001 0 00000 + 1-padding = 0x20 0x80 0x20 0x7F; output
    is the downshifted walk << 1 = [100, 100, 98, 98]."""
    rng = np.random.default_rng(41)
    for prec, dtype, hi in ((8, np.uint8, 256), (12, np.uint16, 4096),
                            (16, np.uint16, 65536)):
        for pt in (1, 3, prec - 1):
            for pred in (1, 4, 7):
                a = rng.integers(0, hi, size=(6, 5), dtype=dtype)
                px, ch = _decode_jpeg_pixels(encode_jpeg_lossless(
                    a, predictor=pred, precision=prec,
                    point_transform=pt))
                exp = (a.astype(np.int64) >> pt) << pt
                assert ch == 1 and np.array_equal(
                    px.reshape(6, 5).astype(np.int64), exp
                ), (prec, pt, pred)
    dht = (b"\xff\xc4" + (2 + 17 + 17).to_bytes(2, "big") + b"\x00"
           + bytes([0, 0, 0, 0, 17] + [0] * 11) + bytes(range(17)))
    sof = (b"\xff\xc3\x00\x0b" + bytes((8,)) + (2).to_bytes(2, "big")
           + (2).to_bytes(2, "big") + bytes((1, 1, 0x11, 0)))
    sos = b"\xff\xda\x00\x08" + bytes((1, 1, 0x00, 1, 0, 1))
    blob = (b"\xff\xd8" + dht + sof + sos
            + bytes((0x20, 0x80, 0x20, 0x7F)) + b"\xff\xd9")
    got = _decode_jpeg_pixels(blob)
    assert got is not None and got[0].tolist() == [100, 100, 98, 98]
