"""ISO BMFF container codec (operators/mp4.py): box walking, sample-table
resolution (multi-run stts, multi-entry stsc, stss), coded-sample
round-trip, malformed-input errors, and the Spark-side frame_sample /
video_metadata plumbing."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from polars_st_spark.operators import mp4 as M


def _frames(doc_id: int, n: int, blocks: int = 3) -> list[bytes]:
    out = []
    for k in range(n):
        seed = hashlib.md5(f"vid:{doc_id}:{k}".encode()).hexdigest()
        out.append(b"".join(
            hashlib.md5(f"{seed}:{j}".encode()).digest() for j in range(blocks)))
    return out


def test_roundtrip_sample_table():
    frames = _frames(7, 9)
    data = M.encode_mp4(frames, timescale=10, deltas=[2] + [1] * 8,
                        chunk_split=4, sync_every=3)
    info = M.parse_mp4(data)
    assert len(info.tracks) == 1
    t = info.tracks[0]
    assert t.codec == "mp4v" and t.handler == "vide"
    assert t.n_samples == 9
    assert t.duration_ticks == 10 and t.timescale == 10
    assert t.width == 32 and t.height == 24
    # stts: first delta 2 then 1s -> ticks 0,2,3,...
    assert t.sample_ticks.tolist() == [0, 2, 3, 4, 5, 6, 7, 8, 9]
    assert t.sync_samples.tolist() == [0, 3, 6]
    # chunk split at 4: offsets contiguous within each chunk
    assert (np.diff(t.sample_offsets[:4]) == 48).all()
    assert (np.diff(t.sample_offsets[4:]) == 48).all()


def test_extract_frames_exact_bytes():
    frames = _frames(3, 7)
    data = M.encode_mp4(frames, chunk_split=3)
    got = M.extract_frames(data, every_n=2)
    assert [k for k, *_ in got] == [0, 2, 4, 6]
    for k, ts, sy, payload in got:
        assert payload == frames[k]
        assert sy == (k % 3 == 0)
    # max_frames caps the explode
    assert len(M.extract_frames(data, every_n=1, max_frames=3)) == 3


def test_variable_sizes_and_uniform_stsz():
    frames = [b"a" * 10, b"bb" * 10, b"c" * 5]
    data = M.encode_mp4(frames, chunk_split=2)
    got = M.extract_frames(data)
    assert [p for _, _, _, p in got] == frames
    # uniform stsz path (sample_size != 0 means one size for all samples)
    box = M._full(b"stsz", 0, 0, struct.pack(">II", 16, 5))
    assert M._parse_stsz(box, 8).tolist() == [16] * 5


def test_malformed_inputs_raise():
    with pytest.raises(ValueError, match="moov"):
        M.parse_mp4(b"\x00" * 32)
    frames = _frames(1, 4)
    data = bytearray(M.encode_mp4(frames))
    # corrupt a box size so it overruns its parent
    data[0:4] = struct.pack(">I", len(data) + 100)
    with pytest.raises(ValueError, match="overruns"):
        M.parse_mp4(bytes(data))


def test_decode_frame_names_codec():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        M.decode_frame(b"\x00\x00\x01", "avc1")


def test_largesize_box():
    frames = _frames(2, 3)
    data = M.encode_mp4(frames)
    # rewrap the whole file inside a largesize 'skip' prefix? simpler:
    # parse a synthetic largesize box directly
    body = b"payload!"
    big = struct.pack(">I", 1) + b"skip" + struct.pack(">Q", 16 + len(body)) + body
    boxes = list(M._walk(big, 0, len(big)))
    assert boxes == [(b"skip", 16, len(big))]
    # and the real file still parses when appended after it
    assert M.parse_mp4(data).tracks[0].n_samples == 3


def test_frame_sample_mp4_spark(spark):
    from pyspark.sql import functions as F

    from polars_st_spark.operators.multimodal import frame_sample, video_metadata

    rows = [(i, M.encode_mp4(_frames(i, 6 + i % 3), timescale=10,
                             deltas=[2] + [1] * (5 + i % 3)))
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id INT, payload BINARY")
    out = frame_sample(df, "payload", "doc_id", every_n=2, n_frames=100,
                       decode="mp4").orderBy("doc_id", "frame_index").collect()
    for r in out:
        expect = _frames(r["doc_id"], 9)[r["frame_index"]]
        assert bytes(r["frame_payload"]) == expect
        assert r["is_sync"] == (r["frame_index"] % 3 == 0)
    # doc 0: 6 samples -> indices 0,2,4; doc 1: 7 -> 0,2,4,6
    n_by_doc = {}
    for r in out:
        n_by_doc[r["doc_id"]] = n_by_doc.get(r["doc_id"], 0) + 1
    assert n_by_doc == {0: 3, 1: 4, 2: 4, 3: 3}

    meta = {r["doc_id"]: r for r in
            video_metadata(df, "payload", "doc_id").collect()}
    assert meta[0]["n_samples"] == 6 and meta[1]["n_samples"] == 7
    assert meta[0]["codec"] == "mp4v"
    # duration: first delta 2 + (n-1) ones = n+1 ticks at timescale 10
    assert meta[2]["duration_s"] == pytest.approx(0.9)
    assert meta[0]["n_sync"] == 2 and meta[1]["n_sync"] == 3


def test_frame_sample_real_still_raises(spark):
    from polars_st_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame([(1, b"x")], "doc_id INT, payload BINARY")
    with pytest.raises(NotImplementedError, match="mp4"):
        frame_sample(df, "payload", "doc_id", decode="real")
