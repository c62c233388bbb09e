"""Streaming media ingest: files decode through the same quarantine-
aware operator as batch; a corrupt blob lands a decode_error row and
the stream keeps running; restarts don't re-emit processed files."""

from __future__ import annotations

import numpy as np

from dataingestiontohana_spark.operators.multimodal import encode_png
from dataingestiontohana_spark.streaming.media import run_media_ingest


def _write(path, name, data: bytes):
    tmp = path / f".{name}.tmp"
    tmp.write_bytes(data)
    tmp.rename(path / name)


def test_stream_decodes_and_quarantines(spark, tmp_path):
    import struct

    src = tmp_path / "drop"
    src.mkdir()
    rng = np.random.default_rng(71)
    arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    good = encode_png(arr, 2)
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0xFF  # CRC break
    _write(src, "a.png", good)
    _write(src, "b.png", bytes(bad))
    v = rng.integers(-(1 << 15), 1 << 15, size=16, dtype=np.int64)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    raw = v.astype("<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(raw)) + raw)
    _write(src, "c.wav", wav)

    rows: list = []
    q = run_media_ingest(spark, str(src), str(tmp_path / "ck"), rows)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    assert len(rows) == 3
    ok = [r for r in rows if r["decode_error"] is None]
    quarantined = [r for r in rows if r["decode_error"] is not None]
    assert len(quarantined) == 1  # the corrupt PNG, stream alive
    assert "CRC" in quarantined[0]["decode_error"]
    # the dead-letter trail names the offending FILE
    assert quarantined[0]["src_path"].endswith("b.png")
    sums = sorted(r["px_sum"] for r in ok)
    assert sums == sorted(
        [int(arr.astype(np.int64).sum()), int(v.sum())]
    )

    # restart from the same checkpoint with one NEW file: only the new
    # file emits (file-source log replay-safe), ids stable
    arr2 = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    _write(src, "d.png", encode_png(arr2, 0))
    rows2: list = []
    q2 = run_media_ingest(spark, str(src), str(tmp_path / "ck"), rows2)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)
    assert len(rows2) == 1
    assert rows2[0]["px_sum"] == int(arr2.astype(np.int64).sum())
    assert rows2[0]["media_id"] not in {r["media_id"] for r in rows}
