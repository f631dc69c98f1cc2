"""sniff_media_metadata: magic-byte dispatch to the native parsers fills
MEDIA_SCHEMA with genuinely parsed fields; garbage rows yield NULLs, never
errors."""

from __future__ import annotations

import io
import wave

import numpy as np

from polars_st_spark.operators import mp3 as M3
from polars_st_spark.operators import mp4 as M4
from polars_st_spark.operators.jpeg import encode_jpeg
from polars_st_spark.operators.multimodal import (
    _encode_bmp,
    _encode_png,
    _sniff_one,
)


def _wav(n=800, rate=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x00\x00" * n)
    return buf.getvalue()


def test_sniff_all_formats():
    cases = {
        "bmp": (_encode_bmp(np.zeros((6, 5, 3), np.uint8)),
                dict(media_type="image", width=5, height=6)),
        "png": (_encode_png(np.zeros((5, 4, 3), np.uint8)),
                dict(media_type="image", width=4, height=5)),
        "jpeg": (encode_jpeg(np.full((13, 21), 99, np.uint8), quality=90),
                 dict(media_type="image", width=21, height=13)),
        "pjpeg": (encode_jpeg(np.full((11, 19), 9, np.uint8), quality=85,
                              progressive=True),
                  dict(media_type="image", width=19, height=11)),
        "wav": (_wav(), dict(media_type="audio", n_frames=800,
                             sample_rate=16000)),
        "mp4": (M4.encode_mp4([b"x" * 48] * 7, timescale=10),
                dict(media_type="video", width=32, height=24, n_frames=7)),
        "mp3": (M3.encode_mp3_frames("s", 23, id3_junk=10),
                dict(media_type="audio", n_frames=23, sample_rate=44100)),
    }
    for fmt, (payload, expect) in cases.items():
        got = _sniff_one(payload)
        assert got["format"] == fmt, (fmt, got)
        for k, v in expect.items():
            assert got[k] == v, (fmt, k, got)


def test_sniff_garbage_is_null():
    got = _sniff_one(b"\x01\x02\x03\x04notmedia")
    assert got == {"media_type": None, "format": None, "width": None,
                   "height": None, "n_frames": None, "sample_rate": None}


def test_sniff_media_metadata_spark(spark):
    from polars_st_spark.operators.multimodal import sniff_media_metadata

    rows = [
        (1, _encode_bmp(np.zeros((3, 2, 3), np.uint8))),
        (2, _wav(100)),
        (3, M4.encode_mp4([b"y" * 16] * 4)),
        (4, b"garbage-bytes"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, payload BINARY")
    out = {r["doc_id"]: r["payload_meta"]
           for r in sniff_media_metadata(df, "payload").collect()}
    assert out[1]["format"] == "bmp" and out[1]["width"] == 2
    assert out[1]["size_bytes"] == len(rows[0][1])
    assert out[2]["format"] == "wav" and out[2]["n_frames"] == 100
    assert out[3]["format"] == "mp4" and out[3]["n_frames"] == 4
    assert out[4]["format"] is None and out[4]["size_bytes"] == 13
    assert out[5] is None
