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


def test_unsupported_file_quarantines_stream_alive(spark, tmp_path):
    """A stray non-decodable file (wrong container magic — .mp4, .txt,
    editor temp) must NOT wedge the stream: the file-source checkpoint
    replays a failed micro-batch forever on restart, so in streaming
    the NotImplementedError capability boundary routes to the
    quarantine column (quarantine_unsupported=True) instead of
    raising. ADVICE r8 (streaming/media.py)."""
    src = tmp_path / "drop"
    src.mkdir()
    rng = np.random.default_rng(72)
    arr = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    _write(src, "good.png", encode_png(arr, 0))
    # wrong magic entirely — the dispatcher reaches the SGM1 fallthrough
    _write(src, "clip.mp4", b"\x00\x00\x00\x18ftypmp42" + bytes(64))
    _write(src, "notes.txt", b"not media at all\n")

    rows: list = []
    q = run_media_ingest(spark, str(src), str(tmp_path / "ck"), rows)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    assert len(rows) == 3
    bad = {r["src_path"].rsplit("/", 1)[-1]: r for r in rows
           if r["decode_error"] is not None}
    assert set(bad) == {"clip.mp4", "notes.txt"}
    # r12: 'ftyp' leads route to the QuickTime walk, so the moov-less
    # .mp4 stub quarantines as a structural ValueError; the .txt
    # still hits the NotImplementedError capability boundary — both
    # are quarantine rows, the stream stays alive either way
    assert bad["notes.txt"]["decode_error"].startswith(
        "NotImplementedError"
    )
    assert bad["clip.mp4"]["decode_error"].startswith(
        ("NotImplementedError", "ValueError")
    )
    for r in bad.values():
        assert r["width"] is None and r["px_sum"] is None
    ok = [r for r in rows if r["decode_error"] is None]
    assert len(ok) == 1 and ok[0]["px_sum"] == int(arr.astype(np.int64).sum())

    # the checkpoint is NOT wedged: a restart emits only the new file
    _write(src, "more.png", encode_png(arr, 0))
    rows2: list = []
    q2 = run_media_ingest(spark, str(src), str(tmp_path / "ck"), rows2)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)
    assert [r["src_path"].rsplit("/", 1)[-1] for r in rows2] == ["more.png"]


def test_batch_decode_media_still_raises_on_unsupported(spark):
    """The batch default is unchanged: an unsupported container is a
    declared capability boundary and raises loudly. (r12: 'ftyp'
    leads are CLAIMED by the QuickTime walk now — a moov-less stub
    is a quarantined structural error, not this boundary — so the
    pin uses a container no parser claims.)"""
    import pytest
    from dataingestiontohana_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [(1, 0, bytearray(b"\xff\xfb\x90\x00 mp3-ish, undecodable"))],
        "media_id long, kind int, content binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|unsupported"):
        decode_media(df).collect()
    # the ftyp stub: quarantined (corrupt MOV), never a task death
    df2 = spark.createDataFrame(
        [(1, 0, bytearray(b"\x00\x00\x00\x18ftypmp42" + bytes(32)))],
        "media_id long, kind int, content binary",
    )
    rows = decode_media(df2).collect()
    assert len(rows) == 1 and rows[0]["decode_error"] is not None


def test_media_key_is_the_collision_free_sink_identity(spark, tmp_path):
    """media_id is abs(xxhash64(path)) — 63 effective bits, ~5%
    birthday collision odds at 1e9 files — so keyed sinks key on
    media_key (md5 hex of the path, 128-bit). Two rows with the SAME
    media_id but distinct media_key must both survive a keyed upsert
    (VERDICT r8 item 5)."""
    import functools
    import hashlib as _hl
    import sqlite3

    from dataingestiontohana_spark.operators.upsert_sink import (
        SQLiteDialect,
        UpsertSink,
    )
    from dataingestiontohana_spark.streaming.media import decoded_media_stream

    # 1) the streamed frame carries media_key = md5(path) hex
    src = tmp_path / "drop"
    src.mkdir()
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    _write(src, "k.png", encode_png(arr, 0))
    rows: list = []
    q = (
        decoded_media_stream(spark, str(src))
        .writeStream.foreachBatch(lambda b, _e: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    (r,) = rows
    assert r["media_key"] == _hl.md5(r["src_path"].encode()).hexdigest()

    # 2) planted collision: same media_id, different media_key -> the
    # media_key-keyed sink keeps BOTH; a media_id-keyed sink would
    # silently merge them into one row
    db = str(tmp_path / "sink.db")
    sink = UpsertSink(
        table="media_sink",
        key_cols=["media_key"],
        dialect=SQLiteDialect(),
        connection_factory=functools.partial(sqlite3.connect, db),
        write_mode="driver",  # single-writer SQLite file
    )
    sink.ensure_table([("media_key", "TEXT"), ("media_id", "BIGINT"),
                       ("px_sum", "BIGINT")])
    collided = spark.createDataFrame(
        [("aaa0", 42, 10), ("bbb1", 42, 20)],
        "media_key string, media_id long, px_sum long",
    )
    sink.write(collided, upsert=True)
    sink.write(collided, upsert=True)  # replay absorbs idempotently
    con = sqlite3.connect(db)
    n, ids = con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT media_id) FROM media_sink"
    ).fetchone()
    con.close()
    assert n == 2 and ids == 1  # both rows kept despite the id collision


def test_streamed_avi_decodes_with_video_kind(spark, tmp_path):
    """r12: an .avi dropped into the media directory flows through
    the SAME decode path — KIND_VIDEO from the extension, whole-clip
    moments from the MJPEG frame decode — and a corrupt sibling clip
    quarantines without killing the stream."""
    import hashlib
    import struct

    from dataingestiontohana_spark.operators.multimodal import (
        KIND_VIDEO,
        encode_avi_mjpeg,
        encode_jpeg_baseline,
    )

    src = tmp_path / "drop"
    src.mkdir()
    ones = np.ones(64)
    g = np.zeros((16, 24), np.uint8)
    consts = hashlib.md5(b"stream-avi").digest()[:6]
    for j, v in enumerate(consts):
        by, bx = divmod(j, 3)
        g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    jpg = encode_jpeg_baseline(g.reshape(-1), 24, 16, 1, quant_luma=ones)
    good = encode_avi_mjpeg([jpg, jpg, jpg], 24, 16)
    bad = bytearray(good)
    at = good.find(b"avih") + 8 + 16
    bad[at : at + 4] = struct.pack("<I", 9)
    _write(src, "clip.avi", good)
    _write(src, "broken.avi", bytes(bad))

    rows: list = []
    q = run_media_ingest(spark, str(src), str(tmp_path / "ck"), rows)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    assert len(rows) == 2
    by_path = {r["src_path"].rsplit("/", 1)[-1]: r for r in rows}
    ok = by_path["clip.avi"]
    assert ok["kind"] == KIND_VIDEO and ok["n_frames"] == 3
    assert ok["px_sum"] == 3 * 64 * sum(consts)
    assert by_path["broken.avi"]["decode_error"] is not None


def test_streamed_mov_decodes_with_video_kind(spark, tmp_path):
    """r12: a .mov dropped into the media directory routes
    KIND_VIDEO and decodes through the QuickTime sample-table walk;
    a sibling with disagreeing sample tables quarantines without
    killing the stream."""
    import hashlib
    import struct

    from dataingestiontohana_spark.operators.multimodal import (
        KIND_VIDEO,
        encode_jpeg_baseline,
        encode_mov_mjpeg,
    )

    src = tmp_path / "drop"
    src.mkdir()
    ones = np.ones(64)
    g = np.zeros((16, 24), np.uint8)
    consts = hashlib.md5(b"stream-mov").digest()[:6]
    for j, v in enumerate(consts):
        by, bx = divmod(j, 3)
        g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    jpg = encode_jpeg_baseline(g.reshape(-1), 24, 16, 1, quant_luma=ones)
    good = encode_mov_mjpeg([jpg, jpg, jpg], 24, 16)
    bad = bytearray(good)
    at = good.find(b"stsz") + 4 + 8
    bad[at : at + 4] = struct.pack(">I", 9)
    _write(src, "clip.mov", good)
    _write(src, "broken.mov", bytes(bad))

    rows: list = []
    q = run_media_ingest(spark, str(src), str(tmp_path / "ck"), rows)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    assert len(rows) == 2
    by_path = {r["src_path"].rsplit("/", 1)[-1]: r for r in rows}
    ok = by_path["clip.mov"]
    assert ok["kind"] == KIND_VIDEO and ok["n_frames"] == 3
    assert ok["px_sum"] == 3 * 64 * sum(consts)
    assert by_path["broken.mov"]["decode_error"] is not None
