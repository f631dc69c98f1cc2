"""GIF codec (operators/gif.py): LZW round-trips across dictionary-growth
regimes, interlace reordering, extension skipping, error paths, sniffing,
and the real-decode dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from polars_st_spark.operators import gif as G


def _rand(h, w, ncol, seed):
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, ncol, size=(h, w)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
    return idx, pal


@pytest.mark.parametrize("h,w,ncol,interlace", [
    (1, 1, 2, False),
    (8, 8, 4, False),
    (64, 64, 16, False),      # grows the code width past 9 bits
    (100, 200, 256, False),   # 8-bit palette, deep dictionary
    (33, 47, 7, True),        # interlaced, odd dims
    (128, 128, 256, True),
    (300, 300, 3, False),     # forces a mid-stream dictionary reset
])
def test_lzw_roundtrip_exact(h, w, ncol, interlace):
    idx, pal = _rand(h, w, ncol, seed=h * 7 + w)
    img = G.decode_gif(G.encode_gif(idx, pal, interlace=interlace))
    assert img.shape == (h, w, 3)
    assert (img == pal[idx]).all()


def test_extensions_are_skipped():
    idx, pal = _rand(5, 6, 4, seed=3)
    data = bytearray(G.encode_gif(idx, pal))
    # inject a graphic-control extension right after the screen descriptor
    insert_at = 13 + len(pal) // len(pal) * (2 << 1) * 3  # 13 + table bytes
    table_bytes = (2 << ((data[10] & 7))) * 3
    insert_at = 13 + table_bytes
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    data[insert_at:insert_at] = ext
    img = G.decode_gif(bytes(data))
    assert (img == pal[idx]).all()


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        G.decode_gif(b"NOTAGIF" + b"\x00" * 20)


def test_truncated_stream_raises():
    idx, pal = _rand(20, 20, 8, seed=9)
    data = G.encode_gif(idx, pal)
    with pytest.raises(ValueError, match="LZW|gif"):
        G.decode_gif(data[: len(data) // 2])


def test_index_outside_table_raises():
    # a 2-color palette still leaves LZW root codes 0..3 (min code size 2):
    # index 3 is a valid code but an invalid palette entry — must raise,
    # not read out of bounds
    idx = np.full((4, 4), 3, dtype=np.uint8)
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    with pytest.raises(ValueError, match="outside the color table"):
        G.decode_gif(G.encode_gif(idx, pal))


def test_real_decode_dispatch_and_sniff():
    from polars_st_spark.operators.multimodal import _real_decode_image, _sniff_one

    idx, pal = _rand(6, 5, 2, seed=1)
    data = G.encode_gif(idx, pal)
    img = _real_decode_image(data, 6, 5)
    assert img.shape == (6, 5, 3)
    meta = _sniff_one(data)
    assert meta["format"] == "gif" and meta["media_type"] == "image"
    assert meta["width"] == 5 and meta["height"] == 6
