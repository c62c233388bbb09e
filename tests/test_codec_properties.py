"""Property-based codec round trips (hypothesis): ANY legal pixel/
sample array must survive encode -> decode bit-exactly at every
depth/color-type/interlace/filter combination — breadth the
deterministic corpus tests can't enumerate. Pure-python (no Spark
session), so hundreds of examples stay cheap."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dataingestiontohana_spark.operators.multimodal import (
    _parse_png,
    _parse_wav,
    encode_png,
)

_FILTERS = st.tuples(*(st.integers(0, 4) for _ in range(5)))


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 13),
    h=st.integers(1, 11),
    ct=st.sampled_from([0, 2, 4, 6]),
    depth16=st.booleans(),
    interlace=st.integers(0, 1),
    filters=_FILTERS,
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape_depth_filtermix(
    w, h, ct, depth16, interlace, filters, seed
):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    rng = np.random.default_rng(seed)
    if depth16:
        arr = rng.integers(0, 65536, size=(h, w, ch), dtype=np.uint16)
        bd = 16
    else:
        arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        bd = 8
    if ch == 1:
        arr = arr.reshape(h, w)
    png = encode_png(arr, ct, filters=filters, interlace=interlace,
                     bit_depth=bd)
    gw, gh, gch, px = _parse_png(png)
    assert (gw, gh, gch) == (w, h, ch)
    assert px.dtype == (np.uint16 if depth16 else np.uint8)
    assert np.array_equal(px, arr.reshape(-1))


@settings(max_examples=40, deadline=None)
@given(
    d=st.sampled_from([1, 2, 4]),
    w=st.integers(1, 19),
    h=st.integers(1, 9),
    interlace=st.integers(0, 1),
    filters=_FILTERS,
    seed=st.integers(0, 2**31 - 1),
)
def test_png_subbyte_roundtrip(d, w, h, interlace, filters, seed):
    rng = np.random.default_rng(seed)
    mx = (1 << d) - 1
    a = rng.integers(0, mx + 1, size=(h, w), dtype=np.uint8)
    png = encode_png(a, 0, filters=filters, interlace=interlace, bit_depth=d)
    gw, gh, gch, px = _parse_png(png)
    assert (gw, gh, gch) == (w, h, 1)
    want = (a.astype(np.int32) * (255 // mx)).astype(np.uint8)
    assert np.array_equal(px, want.reshape(-1))


def _wav(samples_bytes: bytes, channels: int, bits: int) -> bytes:
    width = bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, 8000, 8000 * width * channels,
                      width * channels, bits)
    return (b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(samples_bytes))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples_bytes))
            + samples_bytes)


@settings(max_examples=60, deadline=None)
@given(
    bits=st.sampled_from([8, 16, 24, 32]),
    stereo=st.booleans(),
    n=st.integers(1, 65),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_native_width(bits, stereo, n, seed):
    rng = np.random.default_rng(seed)
    channels = 1 if bits == 8 else (2 if stereo else 1)
    count = n * channels
    if bits == 8:
        vals = rng.integers(0, 256, size=count, dtype=np.int64)
        raw = vals.astype(np.uint8).tobytes()
    else:
        vals = rng.integers(-(1 << (bits - 1)), 1 << (bits - 1),
                            size=count, dtype=np.int64)
        if bits == 16:
            raw = vals.astype("<i2").tobytes()
        elif bits == 32:
            raw = vals.astype("<i4").tobytes()
        else:
            raw = b"".join(
                int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
            )
    got_n, px = _parse_wav(_wav(raw, channels, bits))
    assert got_n == n
    want = vals if channels == 1 else (
        (vals.reshape(-1, 2)[:, 0] + vals.reshape(-1, 2)[:, 1]) // 2
    )
    assert np.array_equal(px.astype(np.int64), want)
