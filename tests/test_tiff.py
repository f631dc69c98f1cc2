"""Baseline TIFF codec (operators/tiff.py): byte orders, strip layouts,
PackBits, channel counts, error envelope, sniffing, real-decode dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from polars_st_spark.operators import tiff as T


@pytest.mark.parametrize("h,w,c,be,comp,rps", [
    (6, 5, 3, False, 1, None),
    (6, 5, 3, True, 1, 2),
    (10, 7, 1, False, 1, 4),
    (20, 30, 3, False, 32773, 5),
    (8, 8, 4, True, 32773, None),
    (1, 1, 1, False, 1, None),
    (50, 3, 3, True, 32773, 7),
])
def test_roundtrip_exact(h, w, c, be, comp, rps):
    rng = np.random.RandomState(h * 13 + w)
    img = rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)
    img[:, : w // 2] = 77  # runs for PackBits replicate packets
    data = T.encode_tiff(img if c > 1 else img[:, :, 0], big_endian=be,
                         compression=comp, rows_per_strip=rps)
    out = T.decode_tiff(data)
    assert out.shape == (h, w, c)
    assert (out == img).all()


def test_packbits_primitives():
    row = b"\x01\x01\x01\x01\x02\x03\x04\x05\x05\x05\x05\x05"
    packed = T._packbits(row)
    assert T._unpackbits(packed, len(row)) == row
    # 128 is a no-op code
    assert T._unpackbits(b"\x80" + packed, len(row)) == row


def test_unsupported_features_raise():
    img = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(T.encode_tiff(img))
    with pytest.raises(ValueError, match="byte-order"):
        T.decode_tiff(b"XX" + bytes(data[2:]))
    # patch compression tag (259) to LZW (5)
    lzw = bytearray(data)
    ifd_off = struct.unpack_from("<I", lzw, 4)[0]
    n = struct.unpack_from("<H", lzw, ifd_off)[0]
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", lzw, base)[0] == 259:
            struct.pack_into("<H", lzw, base + 8, 5)
    with pytest.raises(ValueError, match="external codec"):
        T.decode_tiff(bytes(lzw))
    with pytest.raises(ValueError, match="strip"):
        T.decode_tiff(bytes(data[:-10]))


def test_sniff_and_real_decode():
    from polars_st_spark.operators.multimodal import _real_decode_image, _sniff_one

    img = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(6, 5, 3)
    for be in (False, True):
        data = T.encode_tiff(img, big_endian=be, compression=32773)
        meta = _sniff_one(data)
        assert meta["format"] == "tiff" and meta["media_type"] == "image"
        assert meta["width"] == 5 and meta["height"] == 6
        out = _real_decode_image(data, 6, 5)
        assert (out == img).all()
