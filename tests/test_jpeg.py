"""Baseline JPEG codec (operators/jpeg.py): round-trip accuracy across
sampling/restart variants, exactness on DC-only content, header probing,
the documented envelope errors, and the Spark image_features path over
real JPEG bytes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from polars_st_spark.operators import multimodal as M
from polars_st_spark.operators.jpeg import (
    decode_jpeg,
    decode_jpeg_size,
    encode_jpeg,
)


def _smooth_rgb(h=33, w=47):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 + 20) % 200 + 20, (xx * 2 + 50) % 200 + 20,
         ((yy + xx) * 2) % 200 + 20], -1).astype(np.uint8)


def test_flat_gray_dc_only_exact():
    # a constant image quantizes to a DC-only block: decode must be exact
    img = np.full((16, 24), 120, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (16, 24)
    assert int(np.abs(out.astype(int) - 120).max()) == 0


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 2])
def test_roundtrip_smooth(subsample, restart):
    img = _smooth_rgb()
    data = encode_jpeg(img, quality=95, subsample=subsample,
                       restart_interval=restart)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(float) - img).mean()
    # 4:4:4 stays within quantization error; 4:2:0 adds chroma box-average
    assert err < (1.0 if subsample == "444" else 2.5), err


def test_roundtrip_odd_sizes_and_gray_restart():
    g = (np.mgrid[0:13, 0:21][0] * 5 % 251).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95, restart_interval=1))
    assert out.shape == (13, 21)
    assert np.abs(out.astype(float) - g).mean() < 1.0


def test_header_probe_and_quality_tradeoff():
    img = _smooth_rgb(32, 48)
    hi = encode_jpeg(img, quality=95)
    lo = encode_jpeg(img, quality=20)
    assert decode_jpeg_size(hi) == (32, 48, 3)
    assert len(lo) < len(hi)  # coarser tables compress harder
    # low quality still reconstructs the smooth ramp approximately
    assert np.abs(decode_jpeg(lo).astype(float) - img).mean() < 12.0


def test_envelope_errors():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"notajpeg")
    data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    # flip SOF0 -> SOF9 (extended sequential, arithmetic): must raise
    # naming the limitation (SOF2 progressive is SUPPORTED since r8)
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC9
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(bytes(data))
    # truncated segment
    whole = encode_jpeg(_smooth_rgb(16, 16))
    with pytest.raises(ValueError, match="truncated|exhausted|MCU"):
        decode_jpeg(whole[:40])
    # 12-bit precision rejected
    data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 4] = 12
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(bytes(data))


def test_byte_stuffing_roundtrip():
    # content chosen to produce 0xFF bytes in the entropy stream with high
    # probability: noisy high-frequency blocks at high quality
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=100)
    assert b"\xff\x00" in data  # stuffing actually exercised
    out = decode_jpeg(data)
    assert out.shape == img.shape  # decodes cleanly through the unstuffer


def test_image_features_real_jpeg(spark):
    img = _smooth_rgb(16, 16)
    payload = encode_jpeg(img, quality=95)
    df = spark.createDataFrame([(1, bytearray(payload))], ["id", "payload"])
    row = M.image_features(df, "payload", "id", decode="real",
                           resize=(16, 16)).collect()[0]
    exp = decode_jpeg(payload).mean(axis=(0, 1)).astype(np.float32)
    got = np.array(row["features"], dtype=np.float32)
    assert np.allclose(got, exp, atol=1e-4), (got, exp)


def test_fill_bytes_before_markers():
    # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes. Some
    # encoders emit FF FF D0..D7 / FF FF D9 — the unstuffer must treat the
    # fill run as part of the marker, not as end-of-scan (which raised
    # 'entropy data covers X of Y MCUs' before r8).
    img = _smooth_rgb(32, 32)
    data = encode_jpeg(img, quality=90, restart_interval=1)
    sos = data.find(b"\xff\xda")
    assert sos > 0
    body = data[sos:]
    # inject two fill bytes before every RSTn and before EOI; valid streams
    # only contain FF as FF00 (stuffed), FFDn (RST) or FFD9 (EOI), so the
    # 2-byte replace is unambiguous
    for m in list(range(0xD0, 0xD8)) + [0xD9]:
        body = body.replace(bytes([0xFF, m]), bytes([0xFF, 0xFF, 0xFF, m]))
    padded = data[:sos] + body
    assert padded != data
    ref = decode_jpeg(data)
    out = decode_jpeg(padded)
    assert np.array_equal(out, ref)


# ---------------------------------------------------------------------------
# Progressive (SOF2) — r8
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("subsample,restart", [("444", 0), ("420", 0), ("420", 3)])
def test_progressive_matches_baseline_decode(subsample, restart):
    # the progressive scan script reorders the SAME quantized coefficients,
    # so decode(progressive) must be bit-identical to decode(baseline)
    img = _smooth_rgb(33, 47)
    base = encode_jpeg(img, quality=90, subsample=subsample,
                       restart_interval=restart)
    prog = encode_jpeg(img, quality=90, subsample=subsample,
                       restart_interval=restart, progressive=True)
    assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(base))
    assert decode_jpeg_size(prog) == (33, 47, 3)


def test_progressive_gray_and_noise():
    g = (np.mgrid[0:13, 0:21][0] * 5 % 251).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=95, progressive=True)),
        decode_jpeg(encode_jpeg(g, quality=95)))
    # noisy high-frequency content exercises EOB runs (EOBn symbols), ZRL
    # inside refinement scans, and dense correction-bit traffic
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    for q in (100, 40):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, quality=q, progressive=True)),
            decode_jpeg(encode_jpeg(img, quality=q)))


def test_progressive_through_image_features():
    # the multimodal real-decode path routes SOF2 through the same decoder
    from polars_st_spark.operators.multimodal import _real_decode_image

    img = _smooth_rgb(16, 16)
    prog = encode_jpeg(img, quality=95, progressive=True)
    out = _real_decode_image(prog, 16, 16)
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(float) - img).mean() < 2.0
