"""Baseline TIFF codec in pure stdlib + numpy: both byte orders (II/MM),
IFD walk with out-of-line values, strip assembly (RowsPerStrip /
StripOffsets / StripByteCounts), uncompressed (1) and PackBits (32773)
compression, grayscale / RGB / RGBA, 8-bit samples, and
PlanarConfiguration=1. A matching writer exists for round-trip tests and
deterministic gate payloads. Out of envelope (raise naming the feature):
LZW/JPEG-in-TIFF compression, tiled layout, palette color, >8-bit samples.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}


def _read_ifd(data: bytes, off: int, bo: str) -> dict[int, list[int]]:
    n = struct.unpack_from(bo + "H", data, off)[0]
    out: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            voff = base + 8
        else:
            voff = struct.unpack_from(bo + "I", data, base + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # rational/ascii tags are irrelevant here
        out[tag] = list(struct.unpack_from(bo + fmt * count, data, voff))
    return out


def _unpackbits(src: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expect and i < len(src):
        n = src[i]
        i += 1
        if n < 128:
            out += src[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += src[i:i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError(f"tiff: PackBits stream yielded {len(out)} of "
                         f"{expect} bytes")
    return bytes(out[:expect])


def decode_tiff(data: bytes) -> np.ndarray:
    """(h, w, channels) uint8 of the first IFD."""
    data = bytes(data)
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    magic, ifd_off = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise ValueError("tiff: bad magic")
    tags = _read_ifd(data, ifd_off, bo)
    w = tags[256][0]
    h = tags[257][0]
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"tiff: only 8-bit samples supported (got {bits})")
    comp = tags.get(259, [1])[0]
    if comp not in (1, 32773):
        raise ValueError(
            f"tiff: compression {comp} requires an external codec "
            "(only uncompressed and PackBits decode natively)")
    spp = tags.get(277, [len(bits)])[0]
    if tags.get(284, [1])[0] != 1:
        raise ValueError("tiff: planar configuration 2 not supported")
    if tags.get(262, [1])[0] == 3:
        raise ValueError("tiff: palette color not supported")
    rows_per_strip = tags.get(278, [h])[0]
    offsets = tags[273]
    counts = tags.get(279)
    if counts is None:
        if comp != 1:
            raise ValueError("tiff: missing StripByteCounts")
        counts = [min(rows_per_strip, h - i * rows_per_strip) * w * spp
                  for i in range(len(offsets))]
    raw = bytearray()
    for i, (o, c) in enumerate(zip(offsets, counts)):
        chunk = data[o:o + c]
        if len(chunk) < c:
            raise ValueError("tiff: strip overruns the file")
        if comp == 32773:
            rows = min(rows_per_strip, h - i * rows_per_strip)
            chunk = _unpackbits(chunk, rows * w * spp)
        raw += chunk
    if len(raw) < h * w * spp:
        raise ValueError(f"tiff: strips yielded {len(raw)} of "
                         f"{h * w * spp} bytes")
    img = np.frombuffer(bytes(raw[:h * w * spp]), dtype=np.uint8)
    return img.reshape(h, w, spp)


def _packbits(row: bytes) -> bytes:
    """Simple PackBits: runs of >=3 identical bytes become replicate
    packets, everything else literal packets."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i = j + 1
            continue
        # literal: collect until a run of >=3 starts
        start = i
        while i < n and i - start < 128:
            if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                break
            i += 1
        out.append(i - start - 1)
        out += row[start:i]
    return bytes(out)


def encode_tiff(img: np.ndarray, big_endian: bool = False,
                compression: int = 1, rows_per_strip: int | None = None
                ) -> bytes:
    """Minimal valid baseline TIFF from (h, w[, c]) uint8."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    bo = ">" if big_endian else "<"
    if rows_per_strip is None:
        rows_per_strip = max(1, h // 3)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        row = img[y0:y0 + rows_per_strip].tobytes()
        strips.append(_packbits(row) if compression == 32773 else row)

    header = struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 8)
    # IFD directly after header; strip data after the IFD
    tags = []

    def tag(t, typ, vals):
        tags.append((t, typ, vals))

    tag(256, 4, [w])
    tag(257, 4, [h])
    tag(258, 3, [8] * spp)
    tag(259, 3, [compression])
    tag(262, 3, [1 if spp == 1 else 2])  # BlackIsZero / RGB
    tag(273, 4, [0] * len(strips))       # patched below
    tag(277, 3, [spp])
    tag(278, 4, [rows_per_strip])
    tag(279, 4, [len(s) for s in strips])
    tag(284, 3, [1])
    tags.sort()

    n = len(tags)
    ifd_size = 2 + 12 * n + 4
    extra_base = 8 + ifd_size

    def pack_entries(strip_offsets):
        extra = bytearray()
        entries = b""
        for t, typ, vals in tags:
            if t == 273:
                vals = strip_offsets
            fmt = {3: "H", 4: "I"}[typ]
            packed = struct.pack(bo + fmt * len(vals), *vals)
            if len(packed) <= 4:
                val_field = packed + b"\x00" * (4 - len(packed))
            else:
                val_field = struct.pack(bo + "I", extra_base + len(extra))
                extra += packed
            entries += struct.pack(bo + "HHI", t, typ, len(vals)) + val_field
        return entries, bytes(extra)

    # first pass with zero offsets just sizes the out-of-line area
    _, extra0 = pack_entries([0] * len(strips))
    data_base = extra_base + len(extra0)
    offsets = []
    pos = data_base
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    final_entries, extra = pack_entries(offsets)

    ifd = struct.pack(bo + "H", n) + final_entries + struct.pack(bo + "I", 0)
    return header + ifd + bytes(extra) + b"".join(strips)
