"""MP3 frame-header walk (operators/mp3.py): ID3v2 skip, bitrate/sample
rate tables, frame-size arithmetic, VBR detection, error paths, and the
Spark-side mp3_metadata plumbing."""

from __future__ import annotations

import pytest

from polars_st_spark.operators import mp3 as M


def test_walk_vbr_with_id3():
    data = M.encode_mp3_frames("s1", 23, id3_junk=37)
    info = M.parse_mp3(data)
    sizes = {k: (144 * k * 1000) // 44100 for k in (128, 160, 192)}
    assert info["n_frames"] == 23
    assert info["duration_s"] == 23 * 1152 / 44100
    assert info["sample_rate"] == 44100 and info["channels"] == 1
    assert info["total_audio_bytes"] == sum(
        sizes[(128, 160, 192)[k % 3]] for k in range(23))
    assert info["vbr"] is True
    assert info["id3_bytes"] == 47  # 10-byte header + 37 junk


def test_cbr_no_id3():
    data = M.encode_mp3_frames("s2", 5, kbps_cycle=(192,))
    info = M.parse_mp3(data)
    assert info["n_frames"] == 5 and info["vbr"] is False
    assert info["avg_bitrate_kbps"] == 192.0
    assert info["id3_bytes"] == 0


def test_garbage_prefix_resync():
    data = b"\x00garbage\x01" + M.encode_mp3_frames("s3", 4)
    assert M.parse_mp3(data)["n_frames"] == 4


def test_truncated_last_frame_dropped():
    data = M.encode_mp3_frames("s4", 6)
    info = M.parse_mp3(data[:-40])  # cut into the last frame
    assert info["n_frames"] == 5


def test_no_frames_raises():
    with pytest.raises(ValueError, match="no Layer III"):
        M.parse_mp3(b"\x00" * 64)


def test_decode_names_codec():
    with pytest.raises(NotImplementedError, match="codec"):
        M.decode_mp3(M.encode_mp3_frames("s5", 2))


def test_mp3_metadata_spark(spark):
    from polars_st_spark.operators.multimodal import mp3_metadata

    rows = [(i, M.encode_mp3_frames(f"mp3:{i}", 20 + i % 7,
                                    id3_junk=i % 50 + 5))
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id INT, payload BINARY")
    got = {r["doc_id"]: r for r in mp3_metadata(df, "payload", "doc_id").collect()}
    for i in range(6):
        n = 20 + i % 7
        assert got[i]["n_frames"] == n
        assert got[i]["duration_s"] == n * 1152 / 44100
        assert got[i]["vbr"] is True
