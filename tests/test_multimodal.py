"""Multimodal binary-column plumbing tests (deterministic fake codec)."""

from __future__ import annotations

import pytest

from dataingestiontohana_spark.operators.multimodal import (
    KIND_IMAGE,
    KIND_VIDEO,
    decode_media,
    sample_frames,
    synth_media_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, KIND_IMAGE, synth_media_bytes(1, KIND_IMAGE, 32, 16)),
        (2, KIND_VIDEO, synth_media_bytes(2, KIND_VIDEO, 8, 4, n_frames=6)),
    ]
    return spark.createDataFrame(rows, "media_id long, kind int, content binary")


def test_decode_metadata_and_stats(media):
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    img = out[1]
    assert (img["width"], img["height"], img["n_frames"]) == (32, 16, 1)
    assert img["n_bytes"] == 11 + 32 * 16  # header + payload
    assert 0 <= img["mean_px"] <= 255 and img["std_px"] > 0
    vid = out[2]
    assert (vid["width"], vid["height"], vid["n_frames"]) == (8, 4, 6)


def test_decode_is_deterministic(media):
    a = sorted(map(tuple, decode_media(media).collect()))
    b = sorted(map(tuple, decode_media(media).collect()))
    assert a == b


def test_frame_sampling_and_redecode(spark, media):
    frames = sample_frames(media, every_k=2).collect()
    # only the video contributes; 6 frames sampled every 2nd -> 0,2,4
    assert [(r["media_id"], r["frame_idx"]) for r in frames] == [
        (2, 0),
        (2, 2),
        (2, 4),
    ]
    # emitted frames are valid single-frame containers
    single = spark.createDataFrame(
        [(r["frame_idx"], KIND_IMAGE, bytes(r["frame"])) for r in frames],
        "media_id long, kind int, content binary",
    )
    decoded = decode_media(single).collect()
    assert all(r["n_frames"] == 1 and r["n_bytes"] == 11 + 8 * 4 for r in decoded)


def test_real_codec_is_stubbed(spark):
    fake_jpeg = spark.createDataFrame(
        [(9, KIND_IMAGE, b"\xff\xd8\xff\xe0 not a real jpeg")],
        "media_id long, kind int, content binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|stubbed"):
        decode_media(fake_jpeg).collect()
