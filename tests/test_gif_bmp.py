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
    encode_bmp_rle,
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
            gw, gh, nf, ch, px = _parse_gif(encode_gif(idx, pal, interlace=il))
            assert (gw, gh, nf, ch) == (w, h, 1, 3)
            assert np.array_equal(px.reshape(h, w, 3), pal[idx])
    # transparency expands RGBA; transparent pixels composite against
    # the transparent-black canvas (r10 semantics: they do NOT paint
    # palette color under alpha 0)
    idx = rng.integers(0, 64, size=(8, 16), dtype=np.uint8)
    gw, gh, nf, ch, px = _parse_gif(encode_gif(idx, pal, transparent=5))
    assert (nf, ch) == (1, 4)
    got = px.reshape(8, 16, 4)
    opaque = idx != 5
    assert np.array_equal(got[:, :, :3][opaque], pal[idx][opaque])
    assert np.array_equal(got[:, :, :3][~opaque], np.zeros(((~opaque).sum(), 3), np.uint8))
    assert np.array_equal(got[:, :, 3] == 0, idx == 5)
    # a long structured image forces width growth to 12 bits + CLEAR
    big = np.tile(np.arange(256, dtype=np.uint8), 40).reshape(40, 256)
    pal256 = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    _, _, _, _, px = _parse_gif(encode_gif(big, pal256))
    assert np.array_equal(px.reshape(40, 256, 3), pal256[big])


def test_gif_real_third_party_streams_decode():
    """The 1x1 transparent GIF constant decodes exactly; any real GIF
    icons present on this host (CPython's idlelib ships several) must
    decode without LZW desync — every pixel index in palette range,
    exact pixel count."""
    w, h, nf, ch, px = _parse_gif(TINY_TRANSPARENT_GIF)
    assert (w, h, nf, ch) == (1, 1, 1, 4) and px.tolist() == [0, 0, 0, 0]

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
        w, h, nf, ch, px = _parse_gif(b)
        assert px is not None and len(px) == w * h * nf * ch, p


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
    # BI_JPEG embedded payload: valid unsupported layout ->
    # metadata-only (r12: RLE4/8 decode now, so the old RLE example
    # graduated — an RLE flag over a non-RLE body is CORRUPT below)
    b = bytearray(encode_bmp(np.zeros((2, 2), np.uint8),
                             palette=np.zeros((2, 3), np.uint8)))
    b[30:34] = (4).to_bytes(4, "little")  # biCompression = BI_JPEG
    w, h, ch, px = _parse_bmp(bytes(b))
    assert (w, h, ch) == (2, 2, 0) and px is None
    # RLE8 flag over an uncompressed body: structurally corrupt
    b[30:34] = (1).to_bytes(4, "little")  # biCompression = BI_RLE8
    with pytest.raises(ValueError):
        _parse_bmp(bytes(b))
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


def test_bmp_completed_layouts_roundtrip_exactly():
    """r12 closes the declared BMP boundaries: RLE8/RLE4, packed
    1/4-bit palettes, masked 16/32-bit (X1R5G5B5, 565 BI_BITFIELDS,
    BGRX), and BITMAPCOREHEADER — every layout byte-exact through the
    encoder inverse; the 16-bit fixtures sit on the bit-replication
    grid so quantization cancels."""
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    pal16, pal2 = pal[:16], pal[:2]
    H, W = 8, 16

    def rt(blob, want, w=W, h=H):
        pw, ph, ch, px = _parse_bmp(blob)
        assert (pw, ph, ch) == (w, h, 3)
        assert np.array_equal(px.reshape(h, w, 3), want)

    idx = rng.integers(0, 64, size=(H, W), dtype=np.uint8)
    idx[2, 3:10] = 5  # force encoded runs next to absolute segments
    rt(encode_bmp_rle(idx, pal), pal[idx])
    idx4 = rng.integers(0, 16, size=(H, W), dtype=np.uint8)
    idx4[5, 0:7] = 9
    rt(encode_bmp_rle(idx4, pal16, four_bit=True), pal16[idx4])
    idxo = rng.integers(0, 16, size=(5, 7), dtype=np.uint8)
    rt(encode_bmp_rle(idxo, pal16, four_bit=True), pal16[idxo], 7, 5)
    for td in (False, True):
        rt(encode_bmp(idx4, pal16, bits=4, top_down=td), pal16[idx4])
        idx1 = rng.integers(0, 2, size=(H, W), dtype=np.uint8)
        rt(encode_bmp(idx1, pal2, bits=1, top_down=td), pal2[idx1])
    v5 = rng.integers(0, 32, size=(H, W, 3), dtype=np.uint8)
    rgb555 = (v5 << 3) | (v5 >> 2)
    for td in (False, True):
        rt(encode_bmp(rgb555, bits=16, top_down=td), rgb555)
    v6 = rng.integers(0, 64, size=(H, W), dtype=np.uint8)
    rgb565 = np.stack(
        [rgb555[..., 0], (v6 << 2) | (v6 >> 4), rgb555[..., 2]],
        axis=-1,
    )
    rt(
        encode_bmp(rgb565, bits=16, masks=(0xF800, 0x07E0, 0x001F)),
        rgb565,
    )
    rgb8 = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    for td in (False, True):
        rt(encode_bmp(rgb8, bits=32, top_down=td), rgb8)
    rt(encode_bmp(idx, pal, core=True), pal[idx])
    rt(encode_bmp(rgb8, core=True), rgb8)
    rt(encode_bmp(idx4, pal16, bits=4, core=True), pal16[idx4])
    idx1o = rng.integers(0, 2, size=(3, 11), dtype=np.uint8)
    rt(encode_bmp(idx1o, pal2, bits=1, core=True), pal2[idx1o], 11, 3)


def test_bmp_rle_and_mask_contracts():
    """The honesty edges of the r12 layouts: a delta escape leaves
    spec-undefined pixels -> metadata-only, NOT an invented fill; a
    truncated RLE stream is corrupt; overlapping bitfield masks are
    corrupt; >8-bit mask fields have no pinnable byte expansion ->
    metadata-only."""
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, size=(8, 16), dtype=np.uint8)
    blob = encode_bmp_rle(idx, pal, delta_at=(4, 2, 3, 0))
    w, h, ch, px = _parse_bmp(blob)
    assert (w, h, ch, px) == (16, 8, 0, None)
    with pytest.raises(ValueError):
        _parse_bmp(encode_bmp_rle(idx, pal)[:-4])
    rgb = rng.integers(0, 256, size=(8, 16, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="overlapping"):
        _parse_bmp(
            encode_bmp(rgb, bits=16, masks=(0xF800, 0x0FE0, 0x001F))
        )
    # a 10-bit field: structurally valid, expansion unpinnable
    ten = encode_bmp(
        rgb, bits=32, masks=(0x3FF00000, 0x000FFC00, 0x000003FF)
    )
    w, h, ch, px = _parse_bmp(ten)
    assert (w, h, ch, px) == (16, 8, 0, None)


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


def test_gif_animation_compositing_all_disposals():
    """r10 animated GIF: encode_gif_frames -> _parse_gif round trip
    pins the full compositing model — partial-rect frames,
    per-frame transparency punch-through, and disposal 1 (keep),
    2 (restore-to-background) and 3 (restore-to-previous)."""
    from dataingestiontohana_spark.operators.multimodal import (
        encode_gif_frames,
    )

    rng = np.random.default_rng(221)
    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    f0 = rng.integers(0, 64, size=(8, 16), dtype=np.uint8)
    f1 = rng.integers(0, 64, size=(4, 8), dtype=np.uint8)
    f2 = rng.integers(0, 64, size=(4, 8), dtype=np.uint8)
    f3 = rng.integers(0, 64, size=(2, 4), dtype=np.uint8)
    blob = encode_gif_frames((16, 8), [
        (f0, 0, 0, 1, -1),   # full opaque, keep
        (f1, 4, 2, 2, 7),    # partial, transparent idx 7, restore-bg
        (f2, 0, 4, 3, -1),   # partial opaque, restore-previous
        (f3, 10, 0, 1, -1),  # partial opaque after the restores
    ], pal)
    w, h, nf, ch, px = _parse_gif(blob)
    assert (w, h, nf, ch) == (16, 8, 4, 4)
    frames = px.reshape(4, 8, 16, 4)

    # frame 0: full canvas opaque
    exp0 = np.concatenate(
        [pal[f0], np.full((8, 16, 1), 255, np.uint8)], axis=2
    )
    assert np.array_equal(frames[0], exp0)

    # frame 1: rect (4,2)-(12,6) painted where f1 != 7; transparent
    # pixels show frame 0 underneath
    exp1 = exp0.copy()
    sub = exp1[2:6, 4:12]
    op = f1 != 7
    sub[op, :3] = pal[f1][op]
    assert np.array_equal(frames[1], exp1)

    # frame 2's base: frame 1 with rect1 RESTORED TO BACKGROUND
    # (transparent black in RGBA mode), then f2 painted at (0,4)
    base2 = exp1.copy()
    base2[2:6, 4:12] = 0
    exp2 = base2.copy()
    exp2[4:8, 0:8, :3] = pal[f2]
    exp2[4:8, 0:8, 3] = 255
    assert np.array_equal(frames[2], exp2)

    # frame 3's base: RESTORE-PREVIOUS undid f2 -> base2 again
    exp3 = base2.copy()
    exp3[0:2, 10:14, :3] = pal[f3]
    exp3[0:2, 10:14, 3] = 255
    assert np.array_equal(frames[3], exp3)


def test_gif_animation_rgb_mode_background_and_bounds():
    """Opaque animation (no transparency anywhere) stays RGB; the
    restore-to-background value is the global-palette background
    color; a frame rect past the logical screen CLIPS (browsers clip;
    broken encoders emit these — r10 review)."""
    from dataingestiontohana_spark.operators.multimodal import (
        encode_gif_frames,
    )

    pal = np.array([[9, 8, 7]] + [[i, i, i] for i in range(1, 64)],
                   np.uint8)
    f0 = np.full((4, 4), 3, np.uint8)
    f1 = np.full((2, 2), 5, np.uint8)
    blob = encode_gif_frames((4, 4), [
        (f0, 0, 0, 2, -1),  # full frame, then restore-to-background
        (f1, 1, 1, 1, -1),
    ], pal)
    w, h, nf, ch, px = _parse_gif(blob)
    assert (nf, ch) == (2, 3)
    frames = px.reshape(2, 4, 4, 3)
    assert np.array_equal(frames[0], np.broadcast_to(pal[3], (4, 4, 3)))
    # frame 1 base: whole rect restored to pal[bg=0] = (9,8,7)
    exp1 = np.broadcast_to(pal[0], (4, 4, 3)).copy()
    exp1[1:3, 1:3] = pal[5]
    assert np.array_equal(frames[1], exp1)

    # out-of-bounds rect: our encoder refuses to EMIT one, but the
    # decoder CLIPS one (mutate the image descriptor's x origin)
    with pytest.raises(ValueError, match="outside the logical screen"):
        encode_gif_frames((4, 4), [(f0, 2, 2, 1, -1)], pal)
    ok = bytearray(encode_gif_frames((4, 4), [(f0, 0, 0, 1, -1)], pal))
    # image descriptor sits after header (13) + padded palette (192)
    # + graphic control; search from there (a raw find would hit
    # palette bytes equal to 0x2C)
    at = ok.find(b"\x2c", 13 + 192)
    assert at > 0 and ok[at + 1 : at + 5] == b"\x00\x00\x00\x00"
    ok[at + 1] = 2  # x origin 2: 4-wide frame now overhangs by 2
    w, h, nf, ch, px = _parse_gif(bytes(ok))
    assert (w, h, nf, ch) == (4, 4, 1, 3)
    got = px.reshape(4, 4, 3)
    # left half keeps the initial canvas (bg color), right half shows
    # the frame's clipped left columns
    assert np.array_equal(got[:, :2], np.broadcast_to(pal[0], (4, 2, 3)))
    assert np.array_equal(got[:, 2:], np.broadcast_to(pal[3], (4, 2, 3)))

    # truncation after a complete frame (no 0x3B trailer): decodes
    blob = encode_gif_frames((4, 4), [(f0, 0, 0, 1, -1)], pal)
    assert blob.endswith(b"\x3b")
    w2, h2, nf2, ch2, px2 = _parse_gif(blob[:-1])
    assert nf2 == 1 and np.array_equal(
        px2.reshape(4, 4, 3), np.broadcast_to(pal[3], (4, 4, 3)))
    # but EOF with NO complete frame still raises
    with pytest.raises(ValueError):
        _parse_gif(blob[:20])


def test_sampled_gif_frames_are_self_consistent_containers(spark):
    """r10 review: sample_frames over a multi-channel (RGBA) animated
    GIF must emit SGM1 containers whose header matches the payload —
    every emitted frame re-decodes and survives the image consumers
    (the old (w, h) header over w*ch*h bytes crashed any reshape)."""
    from dataingestiontohana_spark.operators.multimodal import (
        KIND_VIDEO,
        _decode_payload,
        encode_gif_frames,
        resize_images,
        sample_frames,
    )

    rng = np.random.default_rng(223)
    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    f0 = rng.integers(0, 64, size=(8, 16), dtype=np.uint8)
    f1 = rng.integers(0, 64, size=(8, 16), dtype=np.uint8)
    blob = encode_gif_frames((16, 8), [
        (f0, 0, 0, 1, 7), (f1, 0, 0, 1, 7),
    ], pal)
    df = spark.createDataFrame(
        [(1, KIND_VIDEO, blob)], "media_id long, kind int, content binary"
    ).coalesce(1)
    rows = sample_frames(df, every_k=1).collect()
    assert len(rows) == 2
    for r in rows:
        w, h, nf, ch, px = _decode_payload(bytes(r["frame"]))
        assert (w, h, nf, ch) == (16 * 4, 8, 1, 1)  # RGBA byte matrix
        assert len(px) == w * h
        assert int(px.astype("int64").sum()) == r["frame_px_sum"]
    # downstream image consumer path: the emitted frames resize
    # without error (kind gate: relabel as images first)
    from pyspark.sql import functions as F
    frames_df = spark.createDataFrame(
        [(r["media_id"], bytes(r["frame"])) for r in rows],
        "media_id long, content binary",
    ).select("media_id", F.lit(1).alias("kind"), "content").coalesce(1)
    resized = resize_images(frames_df, out_w=8, out_h=4).collect()
    assert len(resized) == 2


def test_gif_animation_fuzz_against_reference_compositor():
    """Randomized animations (frame counts, rects, disposals 0-3,
    per-frame transparency) round-trip through encode_gif_frames ->
    _parse_gif and must match an INDEPENDENT reference compositor
    written straight from the documented contract — combinations of
    disposal and transparency are where compositing models break, and
    two hand cases can't cover the cross product."""
    from dataingestiontohana_spark.operators.multimodal import (
        encode_gif_frames,
    )

    rng = np.random.default_rng(224)

    def reference(sw, sh, frames, pal):
        ch = 4 if any(f[4] >= 0 for f in frames) else 3
        clear = (np.zeros(ch, np.uint8) if ch == 4
                 else pal[0].copy())  # bg index 0 in encode_gif_frames
        canvas = np.broadcast_to(clear, (sh, sw, ch)).copy()
        outs = []
        for idx, x, y, disp, t in frames:
            if disp == 3:
                saved = canvas.copy()
            fh, fw = idx.shape
            for yy in range(fh):
                for xx in range(fw):
                    v = int(idx[yy, xx])
                    if t >= 0 and v == t:
                        continue
                    px = list(pal[v])
                    if ch == 4:
                        px.append(255)
                    canvas[y + yy, x + xx] = px
            outs.append(canvas.copy())
            if disp == 2:
                canvas[y : y + fh, x : x + fw] = clear
            elif disp == 3:
                canvas = saved
        return np.stack(outs), ch

    for trial in range(40):
        sw = int(rng.integers(4, 20))
        sh = int(rng.integers(4, 12))
        npal = int(rng.integers(8, 64))
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        nf = int(rng.integers(1, 5))
        frames = []
        for _f in range(nf):
            fw = int(rng.integers(1, sw + 1))
            fh = int(rng.integers(1, sh + 1))
            x = int(rng.integers(0, sw - fw + 1))
            y = int(rng.integers(0, sh - fh + 1))
            disp = int(rng.integers(0, 4))
            t = int(rng.integers(0, npal)) if rng.random() < 0.5 else -1
            idx = rng.integers(0, npal, size=(fh, fw), dtype=np.uint8)
            frames.append((idx, x, y, disp, t))
        blob = encode_gif_frames((sw, sh), frames, pal)
        w, h, gnf, gch, px = _parse_gif(blob)
        exp, ech = reference(sw, sh, frames, pal)
        assert (w, h, gnf, gch) == (sw, sh, nf, ech), trial
        got = px.reshape(nf, sh, sw, gch)
        assert np.array_equal(got, exp), f"trial {trial}"


def test_gif_bomb_and_oversize_degrade_to_metadata_only():
    """r11 (ADVICE): oversized-but-structurally-valid GIFs must NOT
    raise (that would quarantine plausible data) and must NOT
    materialize the composited animation (a small LZW payload can
    declare a multi-GB expansion — decode_media sits downstream of
    WARC ingestion of untrusted crawl bytes). Contract: metadata-only
    (channels=0, px=None) with an EXACT n_frames from the structural
    walk; truncation inside the walk still raises."""
    from dataingestiontohana_spark.operators.multimodal import (
        encode_gif_frames,
    )

    pal = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    f = np.zeros((1, 1), np.uint8)

    # 1) oversized logical screen (> 2^26 px) on a well-formed stream:
    #    hand-patch the screen dims of a valid 1-frame GIF
    blob = bytearray(encode_gif_frames((1, 1), [(f, 0, 0, 0, -1)], pal))
    blob[6:10] = np.uint16(9000).tobytes() * 2  # 9000x9000 > 2^26
    w, h, nf, ch, px = _parse_gif(bytes(blob))
    assert (w, h, nf, ch, px) == (9000, 9000, 1, 0, None)

    # 2) frame-count bomb: screen 4096x4096 (legal per-frame), tiny
    #    1x1 frames, but nf*sw*sh*4 crosses the 2^28-byte output
    #    budget at frame 5 — the whole file degrades, n_frames exact
    frames6 = [(f, 0, 0, 0, -1)] * 6
    blob = bytearray(encode_gif_frames((4, 4), frames6, pal))
    blob[6:10] = np.uint16(4096).tobytes() * 2
    w, h, nf, ch, px = _parse_gif(bytes(blob))
    assert (w, h, nf, ch, px) == (4096, 4096, 6, 0, None)
    # under the budget (4 frames = exactly 2^28, not over): decodes
    blob = bytearray(encode_gif_frames((4, 4), frames6[:4], pal))
    blob[6:10] = np.uint16(4096).tobytes() * 2
    w, h, nf, ch, px = _parse_gif(bytes(blob))
    assert (nf, ch) == (4, 3) and px is not None

    # 3) oversized frame rect (> 2^26 px, descriptor-patched): the
    #    old guard raised; now metadata-only
    blob = bytearray(encode_gif_frames((4, 4), [(f, 0, 0, 0, -1)], pal))
    at = blob.find(b"\x2c", 13 + 6)
    assert at > 0
    blob[at + 5 : at + 9] = np.uint16(9000).tobytes() * 2
    w, h, nf, ch, px = _parse_gif(bytes(blob))
    assert (w, h, nf, ch, px) == (4, 4, 1, 0, None)

    # 4) structural violations still raise in metadata-only mode:
    #    truncation mid-walk on the oversized-screen stream
    blob = bytearray(encode_gif_frames((1, 1), [(f, 0, 0, 0, -1)], pal))
    blob[6:10] = np.uint16(9000).tobytes() * 2
    with pytest.raises(ValueError):
        _parse_gif(bytes(blob[: len(blob) // 2]))

    # 5) the decode_media dispatcher passes the metadata row through
    blob = bytearray(encode_gif_frames((1, 1), [(f, 0, 0, 0, -1)], pal))
    blob[6:10] = np.uint16(9000).tobytes() * 2
    w, h, nf, ch, px = _decode_payload(bytes(blob))
    assert (w, h, nf, ch, px) == (9000, 9000, 1, 0, None)


def test_tiff_baseline_roundtrips_and_contracts():
    """r12: baseline TIFF — 8-bit gray (both photometric polarities),
    RGB, palette, 1-bit bilevel, each uncompressed AND PackBits, in
    both byte orders, single- and multi-strip — byte-exact through
    the encoder inverse. LZW/tiled/planar layouts stay metadata-only
    with dims; truncated strips and PackBits desync raise."""
    import struct

    from dataingestiontohana_spark.operators.multimodal import (
        _parse_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(21)
    H, W = 8, 16
    g = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    bil = rng.integers(0, 2, size=(H, W), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(H, W), dtype=np.uint8)

    def rt(blob, want, ch):
        pw, ph, pch, px = _parse_tiff(blob)
        assert (pw, ph, pch) == (W, H, ch)
        assert np.array_equal(
            px.reshape(-1), np.asarray(want, np.uint8).reshape(-1)
        )

    for be in (False, True):
        for comp in (1, 32773):
            for rps in (0, 3):
                rt(encode_tiff(g, 1, comp, rps, be), g, 1)
                # WhiteIsZero: stored bytes invert on decode
                rt(encode_tiff(255 - g, 0, comp, rps, be), g, 1)
                rt(encode_tiff(rgb, 2, comp, rps, be), rgb, 3)
                rt(
                    encode_tiff(idx, 3, comp, rps, be, colormap=pal),
                    pal[idx], 3,
                )
                rt(encode_tiff(bil, 1, comp, rps, be), bil * 255, 1)
                rt(encode_tiff(1 - bil, 0, comp, rps, be), bil * 255, 1)
    # LZW flag: valid-unsupported, dims intact
    blob = bytearray(encode_tiff(g, 1))
    at = blob.find(struct.pack("<HHI", 259, 3, 1))
    blob[at + 8 : at + 10] = struct.pack("<H", 5)
    assert _parse_tiff(bytes(blob)) == (W, H, 0, None)
    # tiled layout (TileWidth tag): metadata-only
    blob = bytearray(encode_tiff(g, 1))
    at = blob.find(struct.pack("<HHI", 278, 3, 1))
    blob[at : at + 2] = struct.pack("<H", 322)
    assert _parse_tiff(bytes(blob))[2] == 0
    # truncated strip: corrupt
    with pytest.raises(ValueError, match="strip past"):
        _parse_tiff(encode_tiff(rgb, 2)[:-20])


def test_tiff_mutations_never_escape():
    """No integrity words in TIFF either: the GIF/BMP mutation
    contract — every single-byte mutation and truncation lands in
    pixels / metadata / caught-error."""
    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, size=(8, 16, 3), dtype=np.uint8)
    from dataingestiontohana_spark.operators.multimodal import (
        encode_tiff,
    )

    tif = encode_tiff(rgb, 2, 32773, 3)
    for i in range(len(tif)):
        mutated = bytearray(tif)
        mutated[i] ^= 0xA5
        assert _outcome(bytes(mutated)) in (
            "pixels", "metadata", "error",
        ), i
    for cut in range(len(tif)):
        assert _outcome(tif[:cut]) in (
            "pixels", "metadata", "error",
        ), cut
