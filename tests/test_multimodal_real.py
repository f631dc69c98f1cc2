"""Real codec-free media decode (operators/multimodal.py decode='real'):
BMP images (hand-parsed spec) and PCM WAV audio (stdlib wave)."""

import io
import math
import struct
import wave

import numpy as np
import pytest

from polars_st_spark.operators import multimodal as M


def _gradient_img(h, w):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * 7
    img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 11
    img[:, :, 2] = 201
    return img


def test_bmp_roundtrip_including_padding():
    for h, w in [(8, 8), (5, 7), (1, 1), (3, 2)]:  # odd widths exercise padding
        img = _gradient_img(h, w)
        back = M._decode_bmp(M._encode_bmp(img))
        assert np.array_equal(back, img), (h, w)


def test_bmp_32bpp_and_errors():
    # hand-build a 2x1 32-bpp BMP (BGRA, top-down via negative height)
    pix = bytes([10, 20, 30, 255, 40, 50, 60, 255])
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, len(pix), 0, 0, 0, 0)
    img = M._decode_bmp(header + info + pix)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [30, 20, 10]  # BGR -> RGB
    assert img[0, 1].tolist() == [60, 50, 40]
    with pytest.raises(ValueError, match="magic"):
        M._decode_bmp(b"XX" + bytes(60))
    bad_info = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 8, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="unsupported BMP"):
        M._decode_bmp(header + bad_info + pix)


def test_image_features_real_bmp(spark):
    # two solid-color BMPs: features are exactly the channel values
    red = np.zeros((6, 6, 3), dtype=np.uint8); red[:, :, 0] = 200
    blue = np.zeros((4, 10, 3), dtype=np.uint8); blue[:, :, 2] = 90
    df = spark.createDataFrame(
        [(0, bytearray(M._encode_bmp(red))), (1, bytearray(M._encode_bmp(blue)))],
        ["id", "payload"])
    out = {r["id"]: r for r in
           M.image_features(df, "payload", "id", decode="real", resize=(4, 4)).collect()}
    assert out[0]["features"] == pytest.approx([200.0, 0.0, 0.0])
    assert out[1]["features"] == pytest.approx([0.0, 0.0, 90.0])
    assert out[0]["height"] == 4 and out[0]["width"] == 4


def test_image_resize_real_composes(spark):
    img = _gradient_img(16, 16)
    df = spark.createDataFrame([(0, bytearray(M._encode_bmp(img)))], ["id", "payload"])
    once = M.image_resize(df, "payload", "id", size=(8, 8), decode="real")
    # output payload is itself a valid BMP -> a second real stage composes
    twice = M.image_resize(once, "payload", "id", size=(4, 4), decode="real")
    row = twice.collect()[0]
    back = M._decode_bmp(bytes(row["payload"]))
    assert back.shape == (4, 4, 3)
    want = M._resize_nearest(M._resize_nearest(img, 8, 8), 4, 4)
    assert np.array_equal(back, want)


def _wav_bytes(freq, rate, seconds, amp=0.5, nch=1, width=2):
    n = int(rate * seconds)
    t = np.arange(n) / rate
    sig = (amp * np.sin(2 * math.pi * freq * t) * 32767).astype("<i2")
    if nch == 2:
        sig = np.repeat(sig, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        wf.writeframes(sig.tobytes())
    return buf.getvalue()


def test_audio_features_real_wav(spark):
    payload = _wav_bytes(440.0, 16000, 0.5)
    stereo = _wav_bytes(100.0, 8000, 0.25, nch=2)
    df = spark.createDataFrame(
        [(0, bytearray(payload)), (1, bytearray(stereo))], ["id", "payload"])
    out = {r["id"]: r for r in
           M.audio_features(df, "payload", "id", decode="real").collect()}
    a = out[0]
    assert a["duration_s"] == pytest.approx(0.5, abs=1e-6)
    assert a["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)  # sine RMS
    # zcr of a 440 Hz sine at 16 kHz: 2 crossings per cycle
    assert a["zero_crossing_rate"] == pytest.approx(2 * 440 / 16000, rel=0.05)
    assert a["low_band_energy"] > 0.95  # 440 Hz << Nyquist/2
    b = out[1]
    assert b["duration_s"] == pytest.approx(0.25, abs=1e-6)


def test_non_bmp_real_raises(spark):
    df = spark.createDataFrame([(0, bytearray(b"\x89PNG then junk"))], ["id", "payload"])
    with pytest.raises(Exception, match="Pillow|BMP"):
        M.image_features(df, "payload", "id", decode="real").collect()


def test_png_roundtrip_all_filters_and_channels():
    rng = np.random.RandomState(7)
    for nch in (1, 2, 3, 4):
        for filters in ("none", "cycle"):
            for h, w in [(1, 1), (7, 5), (16, 16), (33, 9)]:
                img = rng.randint(0, 256, (h, w, nch), dtype=np.uint8)
                back = M._decode_png(M._encode_png(img, filters=filters))
                assert np.array_equal(back, img), (nch, filters, h, w)


def test_png_hand_crafted_filters():
    """Filter math checked against hand-computed residuals (RFC 2083 §6),
    independent of the encoder."""
    import zlib

    def craft(w, h, color, lines):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (M._PNG_SIG + M._png_chunk(b"IHDR", ihdr)
                + M._png_chunk(b"IDAT", zlib.compress(lines))
                + M._png_chunk(b"IEND", b""))

    # Sub on gray: raw [10, 250, 8] -> residuals [10, 240, 14] (mod 256)
    out = M._decode_png(craft(3, 1, 0, bytes([1, 10, 240, 14])))
    assert out.reshape(-1).tolist() == [10, 250, 8]
    # Up: row0 raw [5, 200], row1 raw [7, 190] -> residuals [2, 246]
    out = M._decode_png(craft(2, 2, 0, bytes([0, 5, 200, 2, 2, 246])))
    assert out.reshape(2, 2).tolist() == [[5, 200], [7, 190]]
    # Average: row0 [4, 8], row1 raw [10, 20]; preds: (0+4)//2=2, (10+8)//2=9
    out = M._decode_png(craft(2, 2, 0, bytes([0, 4, 8, 3, 8, 11])))
    assert out.reshape(2, 2).tolist() == [[4, 8], [10, 20]]
    # Paeth: row0 [3, 9], row1 raw [5, 12]; p(a=0,b=3,c=0)=3, p(a=5,b=9,c=3)=9
    out = M._decode_png(craft(2, 2, 0, bytes([0, 3, 9, 4, 2, 3])))
    assert out.reshape(2, 2).tolist() == [[3, 9], [5, 12]]


def test_png_palette_and_errors():
    import zlib

    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]], np.uint8)
    idx = np.array([[0, 3], [2, 1]], np.uint8)
    lines = b"".join(b"\x00" + idx[r].tobytes() for r in range(2))
    data = (M._PNG_SIG
            + M._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
            + M._png_chunk(b"PLTE", plte.tobytes())
            + M._png_chunk(b"IDAT", zlib.compress(lines))
            + M._png_chunk(b"IEND", b""))
    assert np.array_equal(M._decode_png(data), plte[idx])
    # corrupted CRC is detected
    bad = bytearray(M._encode_png(np.zeros((2, 2, 3), np.uint8)))
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        M._decode_png(bytes(bad))
    # 16-bit depth raises naming the limitation
    deep = (M._PNG_SIG
            + M._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
            + M._png_chunk(b"IDAT", zlib.compress(bytes([0, 0, 0])))
            + M._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8-bit"):
        M._decode_png(deep)
    with pytest.raises(ValueError, match="signature"):
        M._decode_png(b"\x89PNG then junk")
    # truncated file and corrupted chunk length raise the module's
    # ValueError contract, not a raw struct.error (r6 ADVICE)
    whole = M._encode_png(np.zeros((3, 3, 3), np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        M._decode_png(whole[:20])
    hacked = bytearray(whole)
    hacked[8:12] = struct.pack(">I", 1 << 30)  # IHDR claims 1 GiB body
    with pytest.raises(ValueError, match="truncated"):
        M._decode_png(bytes(hacked))


def test_image_features_real_png(spark):
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        [(1, bytearray(M._encode_png(img, filters="cycle")))], ["id", "payload"])
    row = M.image_features(df, "payload", "id", decode="real",
                           resize=(4, 4)).collect()[0]
    exp = img.mean(axis=(0, 1))
    assert [round(v, 4) for v in row["features"]] == [round(float(e), 4) for e in exp]


def test_image_resize_real_png_to_bmp(spark):
    # PNG in, resized BMP out: the two real codecs compose in one pipeline
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    df = spark.createDataFrame(
        [(1, bytearray(M._encode_png(img)))], ["id", "payload"])
    out = M.image_resize(df, "payload", "id", size=(4, 4), decode="real").collect()[0]
    back = M._decode_bmp(bytes(out["payload"]))
    assert np.array_equal(back, M._resize_nearest(img, 4, 4))
