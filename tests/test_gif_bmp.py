"""GIF + BMP codecs (round 9): round-trip exactness (real LZW with
dictionary growth, interlace, transparency; BMP row orders + padding),
the JPEG-style mutation contract (neither format carries a CRC, so no
mutation may escape as an uncaught non-corrupt exception), and a pin
against REAL third-party GIF streams — dictionary-growth timing is
where a homegrown LZW desyncs from real encoders."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from dataingestiontohana_spark.operators.multimodal import (
    _CORRUPT_ERRORS,
    _decode_payload,
    _parse_bmp,
    _parse_gif,
    encode_bmp,
    encode_gif,
)

# the canonical 43-byte 1x1 transparent GIF (a public web constant):
# a REAL stream no variant of this repo's encoder produced
TINY_TRANSPARENT_GIF = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\xff\xff\xff"
    b"!\xf9\x04\x01\x00\x00\x00\x00"
    b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
)


def test_gif_roundtrip_growth_interlace_transparency():
    rng = np.random.default_rng(215)
    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    for h, w in ((7, 9), (33, 17)):
        idx = rng.integers(0, 64, size=(h, w), dtype=np.uint8)
        for il in (False, True):
            gw, gh, ch, px = _parse_gif(encode_gif(idx, pal, interlace=il))
            assert (gw, gh, ch) == (w, h, 3)
            assert np.array_equal(px.reshape(h, w, 3), pal[idx])
    # transparency expands RGBA with alpha 0 exactly at the key index
    idx = rng.integers(0, 64, size=(8, 16), dtype=np.uint8)
    gw, gh, ch, px = _parse_gif(encode_gif(idx, pal, transparent=5))
    assert ch == 4
    got = px.reshape(8, 16, 4)
    assert np.array_equal(got[:, :, :3], pal[idx])
    assert np.array_equal(got[:, :, 3] == 0, idx == 5)
    # a long structured image forces width growth to 12 bits + CLEAR
    big = np.tile(np.arange(256, dtype=np.uint8), 40).reshape(40, 256)
    pal256 = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    _, _, _, px = _parse_gif(encode_gif(big, pal256))
    assert np.array_equal(px.reshape(40, 256, 3), pal256[big])


def test_gif_real_third_party_streams_decode():
    """The 1x1 transparent GIF constant decodes exactly; any real GIF
    icons present on this host (CPython's idlelib ships several) must
    decode without LZW desync — every pixel index in palette range,
    exact pixel count."""
    w, h, ch, px = _parse_gif(TINY_TRANSPARENT_GIF)
    assert (w, h, ch) == (1, 1, 4) and px.tolist() == [0, 0, 0, 0]

    # fixed candidate roots only — a recursive glob over / would walk
    # the whole filesystem
    import sysconfig

    roots = [
        sysconfig.get_paths()["stdlib"] + "/idlelib/Icons",
        "/usr/lib/python3.11/idlelib/Icons",
    ]
    real = []
    for r in roots:
        real.extend(sorted(glob.glob(r + "/*.gif"))[:10])
    for p in real:
        with open(p, "rb") as fh:
            b = fh.read()
        w, h, ch, px = _parse_gif(b)
        assert px is not None and len(px) == w * h * ch, p


def test_bmp_roundtrip_orders_and_padding():
    rng = np.random.default_rng(216)
    for w in (5, 6, 7, 8):  # every stride-padding residue
        arr = rng.integers(0, 256, size=(4, w, 3), dtype=np.uint8)
        for td in (False, True):
            bw, bh, ch, px = _parse_bmp(encode_bmp(arr, top_down=td))
            assert (bw, bh, ch) == (w, 4, 3)
            assert np.array_equal(px.reshape(4, w, 3), arr)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 5), dtype=np.uint8)
    for td in (False, True):
        bw, bh, ch, px = _parse_bmp(encode_bmp(idx, palette=pal, top_down=td))
        assert ch == 3 and np.array_equal(px.reshape(6, 5, 3), pal[idx])


def test_bmp_unsupported_layouts_count_only_violations_raise():
    # RLE8 compression: valid unsupported layout -> metadata-only
    b = bytearray(encode_bmp(np.zeros((2, 2), np.uint8),
                             palette=np.zeros((2, 3), np.uint8)))
    b[30:34] = (1).to_bytes(4, "little")  # biCompression = BI_RLE8
    w, h, ch, px = _parse_bmp(bytes(b))
    assert (w, h, ch) == (2, 2, 0) and px is None
    # truncated pixel array: corrupt
    good = encode_bmp(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="truncated pixel array"):
        _parse_bmp(good[:-8])
    # out-of-range palette index: corrupt
    pal1 = np.zeros((2, 3), np.uint8)
    img = encode_bmp(np.zeros((2, 2), np.uint8), palette=pal1)
    mutated = bytearray(img)
    mutated[-4] = 9  # index past the 2-entry palette
    with pytest.raises(ValueError, match="index out of range"):
        _parse_bmp(bytes(mutated))


def _outcome(b: bytes) -> str:
    try:
        _w, _h, _nf, ch, px = _decode_payload(b)
    except _CORRUPT_ERRORS:
        return "error"
    except NotImplementedError:
        return "error"  # mutated magic fell off the format: still caught
    return "pixels" if px is not None else "metadata"


def test_gif_bmp_mutations_never_escape():
    """No CRC in either container, so the pinned contract is the JPEG
    one: every single-byte mutation and truncation lands in pixels /
    metadata / caught-error — an uncaught exception class would kill
    the whole Spark task instead of quarantining the row."""
    rng = np.random.default_rng(217)
    pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    gif = encode_gif(
        rng.integers(0, 32, size=(9, 11), dtype=np.uint8), pal,
        interlace=True, transparent=3,
    )
    bmp = encode_bmp(rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8))
    for blob in (gif, bmp):
        for i in range(len(blob)):
            mutated = bytearray(blob)
            mutated[i] ^= 0x5A
            assert _outcome(bytes(mutated)) in (
                "pixels", "metadata", "error"
            ), i
        for cut in range(len(blob)):
            assert _outcome(blob[:cut]) in ("pixels", "metadata", "error")
