"""Arithmetic-coded JPEG decode (r9): third-party interop pins.

The fixtures under tests/data/jpeg_arith/ were generated ONCE by the
committed gen_fixtures.c using the system libjpeg-turbo (quality 100 =
unit quantization) — each image encoded twice, arithmetic (SOF9) and
Huffman baseline. The pin: our arithmetic decode of the libjpeg
arithmetic stream must be BIT-IDENTICAL to our Huffman decode of the
matching libjpeg Huffman stream. The entropy layers are completely
disjoint implementations (QM-coder vs Huffman tables); everything
downstream (dequant, IDCT, upsample, color) is shared — so equality
pins the QM coder and the F.2.4 statistical models against a real
third-party encoder, with no codec library needed at test time.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from dataingestiontohana_spark.operators.multimodal import (
    _decode_jpeg_pixels,
)

BASE = os.path.join(os.path.dirname(__file__), "data", "jpeg_arith")

PAIRS = [
    # (name, what it exercises)
    ("gray_mosaic", "DC-only blocks, conditioning context walk"),
    ("gray_gradient", "long zero runs, EOB-heavy AC"),
    ("gray_noise", "full AC magnitude trees, Kx low/high split"),
    ("gray_rst", "restart markers: coder + stats + predictor reinit"),
    ("color444", "3-component interleaved MCUs, per-component DC state"),
    ("color420", "default 2x1x1 subsampling: 6-block MCUs"),
]

# SOF10 progressive arithmetic (gen_progressive.c): the same images
# through jpeg_simple_progression — DC first/refine + AC first/refine
# scan scripts with the G.1.3 arithmetic models
PROG_PAIRS = [
    ("gray_noise", "full successive-approximation scan script"),
    ("gray_rst", "restart reinit inside progressive scans"),
    ("color420", "subsampled DC-interleaved first/refine scans"),
    ("gray_gradient", "EOBx boundary in AC refinement"),
]


def _load(name: str) -> bytes:
    with open(os.path.join(BASE, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name,_why", PAIRS)
def test_arith_decodes_bit_identical_to_huffman(name, _why):
    huff = _decode_jpeg_pixels(_load(f"{name}_huff.jpg"))
    arith = _decode_jpeg_pixels(_load(f"{name}_arith.jpg"))
    assert huff is not None and arith is not None
    assert arith[1] == huff[1]  # channels
    assert np.array_equal(arith[0], huff[0])


def test_mosaic_decodes_exactly():
    """Unit quantization + constant blocks: the arithmetic stream must
    reproduce the committed raw pixels bit-exactly (the q204 scheme)."""
    raw = np.frombuffer(_load("gray_mosaic.raw"), np.uint8)
    arith = _decode_jpeg_pixels(_load("gray_mosaic_arith.jpg"))
    assert np.array_equal(arith[0], raw)


@pytest.mark.parametrize("name,_why", PROG_PAIRS)
def test_progressive_arith_decodes_bit_identical(name, _why):
    huff = _decode_jpeg_pixels(_load(f"{name}_huff.jpg"))
    prog = _decode_jpeg_pixels(_load(f"{name}_progarith.jpg"))
    assert huff is not None and prog is not None
    assert prog[1] == huff[1]
    assert np.array_equal(prog[0], huff[0])


def test_sequential_stream_relabeled_sof10_is_malformed():
    """A sequential-arithmetic stream relabeled SOF10 declares a
    progressive frame whose single scan spans Ss=0..Se=63 — an illegal
    progressive band. The decoder must refuse (ValueError quarantine)
    or return metadata-only, never wrong pixels."""
    b = bytearray(_load("gray_mosaic_arith.jpg"))
    at = bytes(b).find(b"\xff\xc9")
    assert at > 0
    b[at + 1] = 0xCA
    try:
        out = _decode_jpeg_pixels(bytes(b))
        assert out is None
    except ValueError:
        pass


def test_truncated_arith_stream_is_deterministic():
    """Truncating the entropy stream feeds zero bytes (the spec's
    marker-detected behavior): decode must not raise unpredictably —
    it either returns pixels or raises ValueError (quarantine), and
    repeated decodes are deterministic."""
    full = _load("gray_noise_arith.jpg")
    eoi = full.rfind(b"\xff\xd9")
    cut = full[: eoi - 5] + b"\xff\xd9"
    try:
        first = _decode_jpeg_pixels(cut)
        second = _decode_jpeg_pixels(cut)
        if first is None:
            assert second is None
        else:
            assert np.array_equal(first[0], second[0])
    except ValueError:
        with pytest.raises(ValueError):
            _decode_jpeg_pixels(cut)


def test_dacless_stream_using_table_ids_2_3_decodes():
    """T.81 F.1.4.4.1.4/.2.1 apply the default conditioning (L=0, U=1;
    Kx=5) to ALL FOUR table destinations — a valid SOF9 stream may
    reference Tb 2/3 without any DAC segment (r9 ADVICE: the decoder
    seeded defaults only for ids 0/1 and misclassified such a file as
    corrupt). Built from the real fixture: its DAC carries exactly the
    defaults, so stripping it and relabeling the SOS to Td=2/Ta=3 must
    decode bit-identical to the original."""
    b = _load("gray_gradient_arith.jpg")
    ref = _decode_jpeg_pixels(b)
    # walk segments: cut the DAC, relabel the SOS component's Td/Ta
    out = bytearray(b[:2])
    i = 2
    while i + 4 <= len(b):
        marker = b[i + 1]
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i : i + 2 + seg_len]
        if marker == 0xCC:  # DAC declaring the defaults: drop it
            assert seg[4:] == bytes.fromhex("00101005")
            i += 2 + seg_len
            continue
        if marker == 0xDA:  # 1-component SOS: Td=2, Ta=3
            seg = bytearray(seg)
            assert seg[4] == 1 and seg[6] == 0x00
            seg[6] = 0x23
            out += seg + b[i + 2 + seg_len :]
            break
        out += seg
        i += 2 + seg_len
    got = _decode_jpeg_pixels(bytes(out))
    assert got is not None, "DAC-less Tb=2/3 stream must decode"
    assert got[1] == ref[1] and np.array_equal(got[0], ref[0])


def test_non_interleaved_arithmetic_sequential_decodes():
    """r11 (verdict item 5): SOF9 with per-component full-band Ns=1
    scans. Fixtures are SPLICED from the committed third-party
    (libjpeg-turbo) single-component QM streams — no entropy bit is
    re-encoded, so the pin still adjudicates the QM coder against a
    real third-party encoder. Three assertions: (a) the spliced
    arithmetic-NI stream decodes bit-identical to the spliced
    HUFFMAN-NI twin of the same planes (disjoint entropy layers,
    shared downstream — the r9/r10 pin philosophy); (b) it matches
    the JFIF conversion of the three planes' own decodes; (c) the Y
    plane keeps its DRI 2, so restart reinit inside a non-interleaved
    arithmetic scan is covered. Partial-subset scans stay
    metadata-only."""
    import numpy as np

    from dataingestiontohana_spark.operators.jpeg_arith_fixtures import (
        ARITH_MOSAIC_JPEGS,
    )
    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_baseline,
        splice_jpeg_noninterleaved,
    )

    ids = (24, 25, 26)  # id 24 carries DRI 2
    assert b"\xff\xdd" in ARITH_MOSAIC_JPEGS[24]
    spliced = splice_jpeg_noninterleaved(
        [ARITH_MOSAIC_JPEGS[k] for k in ids]
    )
    got = _decode_jpeg_pixels(spliced)
    assert got is not None and got[1] == 3

    planes = [
        _decode_jpeg_pixels(ARITH_MOSAIC_JPEGS[k])[0]
        .reshape(16, 24).astype(np.float64)
        for k in ids
    ]
    y, cb, cr = planes
    exp = np.clip(np.round(np.stack([
        y + 1.402 * (cr - 128.0),
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
        y + 1.772 * (cb - 128.0),
    ], axis=-1)), 0, 255).astype(np.uint8).reshape(-1)
    assert np.array_equal(got[0], exp)

    # Huffman-NI twin of the same planes through OUR encoder: the two
    # entropy layouts must land the same pixels
    ones = np.ones(64)
    huffs = [
        encode_jpeg_baseline(
            p.astype(np.uint8).reshape(-1), 24, 16, 1,
            quant_luma=ones,
            restart_interval=2 if k == 24 else 0,
        )
        for k, p in zip(ids, planes)
    ]
    hgot = _decode_jpeg_pixels(splice_jpeg_noninterleaved(huffs))
    assert hgot is not None and np.array_equal(hgot[0], got[0])

    # a 2-of-3 subset arithmetic scan stays metadata-only
    blob = bytearray(spliced)
    at = blob.find(b"\xff\xda")
    blob[at + 4] = 2
    assert _decode_jpeg_pixels(bytes(blob)) is None


def test_qm_encoder_is_the_pinned_decoders_dual():
    """r11: the QM ENCODER (Annex D.1) round-trips raw decisions and
    whole streams through the decoder that is itself pinned
    bit-identical against committed libjpeg-turbo streams — so an
    encoder bug cannot cancel a decoder bug. Covers adaptive-bin
    adaptation, carry propagation, stuffing, and FLUSH."""
    import random

    import numpy as np

    from dataingestiontohana_spark.operators.jpeg_arith import (
        ArithSequentialDecoder,
        ArithSequentialEncoder,
        QMDecoder,
        QMEncoder,
    )

    rng = random.Random(31)
    for trial, p in enumerate((0.5, 0.95, 0.02)):
        enc = QMEncoder()
        stats = bytearray(4)
        bits = [(1 if rng.random() < p else 0, rng.randrange(4))
                for _ in range(4000)]
        for d, i in bits:
            enc.code(stats, i, d)
        seg = enc.flush()
        dec = QMDecoder(seg)
        st2 = bytearray(4)
        assert all(dec.decode(st2, i) == d for d, i in bits), trial

    # model-level: extreme coefficients through the statistical models
    nprng = np.random.default_rng(32)
    dc_cond = dict.fromkeys(range(4), (0, 1))
    ac_cond = dict.fromkeys(range(4), 5)
    enc = ArithSequentialEncoder(dc_cond, ac_cond, [1, 2])
    blocks = []
    for i in range(40):
        for cid in (1, 2):
            b = np.zeros(64, np.int32)
            # DC within +/-16000 keeps consecutive diffs inside
            # the model's spec-bounded +/-32767 magnitude range
            b[0] = int(nprng.integers(-16000, 16000))
            nz = nprng.choice(63, size=int(nprng.integers(0, 12)),
                              replace=False) + 1
            b[nz] = nprng.integers(-32000, 32000, size=len(nz))
            blocks.append((cid, b))
            enc.encode_block(cid, 0, 0, b)
    seg = enc.flush()
    dec = ArithSequentialDecoder(seg, dc_cond, ac_cond, [1, 2])
    for cid, b in blocks:
        assert np.array_equal(dec.decode_block(cid, 0, 0), b)


def test_encode_jpeg_arith_matches_huffman_decode_everywhere():
    """r11: every stream encode_jpeg_arith emits — gray, 4:4:4 color,
    4:2:0, restart intervals, and ALL scan scripts (interleaved,
    non-interleaved Ns=1, PARTIAL-SUBSET 1<Ns<Nf) — must decode
    bit-identical to the Huffman baseline decode of the same pixels.
    This closes the last sequential-JPEG scan-layout boundary for the
    arithmetic path (the Huffman twin closed earlier in r11)."""
    import numpy as np

    from dataingestiontohana_spark.operators.multimodal import (
        encode_jpeg_arith,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(33)
    ones = np.ones(64)
    for w, h, ch, sub in ((24, 16, 1, False), (17, 9, 3, False),
                          (24, 16, 3, True)):
        px = rng.integers(0, 256, size=h * w * ch, dtype=np.uint8)
        huff = _decode_jpeg_pixels(encode_jpeg_baseline(
            px, w, h, ch, subsample=sub,
            quant_luma=ones, quant_chroma=ones))
        for rst in (0, 2):
            got = _decode_jpeg_pixels(encode_jpeg_arith(
                px, w, h, ch, subsample=sub, quant_luma=ones,
                quant_chroma=ones, restart_interval=rst))
            assert got is not None and np.array_equal(got[0], huff[0])
    px = rng.integers(0, 256, size=16 * 24 * 3, dtype=np.uint8)
    huff = _decode_jpeg_pixels(encode_jpeg_baseline(
        px, 24, 16, 3, quant_luma=ones, quant_chroma=ones))
    for groups in ([[1], [2], [3]], [[1, 2], [3]], [[1], [2, 3]]):
        for rst in (0, 2):
            got = _decode_jpeg_pixels(encode_jpeg_arith(
                px, 24, 16, 3, quant_luma=ones, quant_chroma=ones,
                scan_groups=groups, restart_interval=rst))
            assert got is not None and np.array_equal(
                got[0], huff[0]), (groups, rst)
    # third-party interop, encoder side: re-encode the raw pixels of
    # the committed libjpeg mosaic; constant blocks at unit quant
    # decode exactly, so our arithmetic stream must reproduce them
    raw = np.frombuffer(_load("gray_mosaic.raw"), np.uint8)
    got = _decode_jpeg_pixels(encode_jpeg_arith(
        raw, 24, 16, 1, quant_luma=ones))
    assert np.array_equal(got[0], raw)
