"""Property-based tests (hypothesis) over the engine's pure-python
kernels — the layers whose invariants hold for ALL inputs, not just
fixtures: chunk layout arithmetic, the synthetic media container, and
the stdlib PNG codec round trip. No SparkSession per example (these
exercise the python halves the Spark expressions are pinned against),
so hundreds of examples run in seconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dataingestiontohana_spark.operators.chunking import make_chunk_udtf
from dataingestiontohana_spark.operators.multimodal import (
    KIND_IMAGE,
    _decode_payload,
    synth_media_bytes,
)

# chunk/overlap shapes with 0 <= overlap < chunk
_chunk_shapes = st.tuples(st.integers(2, 64), st.integers(0, 63)).filter(
    lambda t: t[1] < t[0]
)


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(
        alphabet=st.sampled_from("ab \t\n.x"), min_size=0, max_size=400
    ),
    shape=_chunk_shapes,
)
def test_chunk_layout_invariants(text, shape):
    """For EVERY text and (chunk, overlap): chunks are contiguous from
    0; every chunk holds 1..chunk tokens; consecutive chunks overlap by
    exactly `overlap` tokens (except a short final chunk); and the
    chunks reassemble the exact token sequence."""
    chunk, overlap = shape
    stride = chunk - overlap
    eval_fn = make_chunk_udtf(chunk, overlap).func().eval
    rows = list(eval_fn(text))

    import re

    norm = re.sub(r"\s+", " ", text.lower(), flags=re.ASCII).strip(
        " \t\n\r\f\v"
    )
    toks = norm.split(" ")

    assert [r[0] for r in rows] == list(range(len(rows)))  # contiguous ids
    assert len(rows) >= 1
    for k, n_tokens, _fp in rows:
        assert 1 <= n_tokens <= chunk
        # chunk k covers tokens [k*stride, k*stride + n_tokens)
        assert n_tokens == len(toks[k * stride : k * stride + chunk])
    # full coverage: the last chunk reaches the final token
    last_k, last_n, _ = rows[-1]
    assert last_k * stride + last_n == len(toks)


@settings(max_examples=100, deadline=None)
@given(
    media_id=st.integers(0, 2**40),
    w=st.integers(1, 48),
    h=st.integers(1, 24),
    nf=st.integers(1, 4),
)
def test_sgm1_container_roundtrip(media_id, w, h, nf):
    """synth_media_bytes -> _decode_payload is an exact round trip for
    every (id, kind, w, h, frames): dimensions recovered, payload
    length w*h*nf, decode deterministic."""
    b = synth_media_bytes(media_id, KIND_IMAGE, w, h, nf)
    assert len(b) == 11 + w * h * nf
    gw, gh, gnf, _ch, px = _decode_payload(b)
    assert (gw, gh, gnf) == (w, h, nf)
    assert px is not None and len(px) == w * h * nf
    assert b == synth_media_bytes(media_id, KIND_IMAGE, w, h, nf)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
)
def test_png_codec_roundtrip_exact(seed, w, h, filters):
    """The stdlib PNG encode (test encoder, any filter mix) ->
    _parse_png decode recovers every pixel exactly, for all sizes and
    filter-type sequences."""
    from tests.test_multimodal import _png_encode

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    gw, gh, gnf, _ch, px = _decode_payload(_png_encode(arr, filters=filters))
    assert (gw, gh, gnf) == (w, h, 1)
    assert px is not None and (px.reshape(h, w) == arr).all()


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    color_type=st.sampled_from([2, 4, 6]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
)
def test_png_color_roundtrip_exact(seed, w, h, color_type, filters):
    """encode_png -> _parse_png recovers every channel byte exactly for
    RGB (2), gray+alpha (4), and RGBA (6), across all sizes and filter
    mixes — the multi-byte-per-pixel unfilter lanes (left neighbor =
    x - bpp) exercised property-style."""
    from dataingestiontohana_spark.operators.multimodal import (
        _PNG_BPP,
        _parse_png,
        encode_png,
    )

    ch = _PNG_BPP[color_type]
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    gw, gh, gch, px = _parse_png(encode_png(arr, color_type, tuple(filters)))
    assert (gw, gh, gch) == (w, h, ch)
    assert px is not None and (px.reshape(h, w, ch) == arr).all()


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    n_pal=st.integers(1, 256),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
)
def test_png_palette_roundtrip_expands_plte(seed, w, h, n_pal, filters):
    """Palette PNGs decode to the PLTE-expanded RGB bytes (channels=3),
    for any palette size and filter mix."""
    from dataingestiontohana_spark.operators.multimodal import (
        _parse_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_pal, size=(h, w)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
    png = encode_png(idx, 3, tuple(filters), palette=pal)
    gw, gh, gch, px = _parse_png(png)
    assert (gw, gh, gch) == (w, h, 3)
    assert px is not None and (px.reshape(h, w, 3) == pal[idx]).all()


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    restart=st.sampled_from([0, 1, 3]),
)
def test_jpeg_gray_unit_quant_roundtrip_bound(seed, w, h, restart):
    """encode_jpeg_baseline -> _decode_jpeg_pixels at unit quant stays
    within +/-2 of the source for EVERY size and restart interval —
    the orthonormal-DCT coefficient-rounding bound, held under
    adversarial (pure-noise) inputs where JPEG is weakest."""
    from dataingestiontohana_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    b = encode_jpeg_baseline(
        arr.reshape(-1), w, h, 1,
        quant_luma=np.ones(64), restart_interval=restart,
    )
    px, ch = _decode_jpeg_pixels(b)
    assert ch == 1
    assert np.abs(px.reshape(h, w).astype(int) - arr.astype(int)).max() <= 2


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    subsample=st.booleans(),
)
def test_jpeg_color_unit_quant_roundtrip_bound(seed, w, h, subsample):
    """Color round trip at unit quant: 4:4:4 within +/-4 per channel
    (DCT + two float color conversions); 4:2:0 exercises geometry on
    GRAY-VALUED color inputs (constant chroma survives the 2x2 boxcar
    exactly, so the same tight bound must hold there too)."""
    from dataingestiontohana_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(seed)
    if subsample:
        arr = np.repeat(
            rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8), 3, axis=2
        )
    else:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    b = encode_jpeg_baseline(
        arr.reshape(-1), w, h, 3, subsample=subsample,
        quant_luma=np.ones(64), quant_chroma=np.ones(64),
    )
    px, ch = _decode_jpeg_pixels(b)
    assert ch == 3
    err = np.abs(px.reshape(h, w, 3).astype(int) - arr.astype(int))
    assert err.max() <= 4
