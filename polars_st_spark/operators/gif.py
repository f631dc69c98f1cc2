"""GIF87a/89a codec in pure stdlib + numpy: header/screen-descriptor parse,
global & local color tables, extension-block skipping, variable-width LZW
decompression with full dictionary growth and CLEAR/END handling, and
4-pass interlace reordering — the palette-image sibling of the BMP/PNG/JPEG
decoders (operators/multimodal.py, operators/jpeg.py). A real LZW encoder
(not just the clear-per-pixel degenerate form) exists so round-trip tests
exercise the decoder's dictionary-building path.

Decodes the FIRST image frame to (h, w, 3) RGB uint8; animation frames
beyond the first, transparency composition, and disposal methods are out
of envelope (documented — a training-data pipeline samples stills).
"""

from __future__ import annotations

import struct

import numpy as np


def _color_table(data: bytes, pos: int, flags: int):
    if not flags & 0x80:
        return None, pos
    n = 2 << (flags & 0x07)
    table = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                          offset=pos).reshape(n, 3).copy()
    return table, pos + 3 * n


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("gif: truncated sub-block chain")
        out += data[pos:pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor): code width grows 3..12 bits, CLEAR
    resets the dictionary, EOI terminates."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width):
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        byte0 = bitpos >> 3
        # codes are packed LSB-first across up to 3 bytes
        chunk = int.from_bytes(data[byte0:byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return code

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev = None
    next_code = end + 1
    while n_out < n_pixels:
        code = read_code(width)
        if code is None:
            raise ValueError(
                f"gif: LZW stream ended after {n_out} of {n_pixels} pixels")
        if code == clear:
            table, width = reset()
            prev = None
            next_code = end + 1
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"gif: corrupt LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError(
            f"gif: LZW stream ended after {n_out} of {n_pixels} pixels")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    src = idx.reshape(h, w)
    out = np.empty_like(src)
    r = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = src[r]
            r += 1
    return out.reshape(-1)


def decode_gif(data: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 of the first image frame."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_table, pos = _color_table(data, pos, flags)
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos = _skip_subblocks(data, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{block:02x}")
        _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        local_table, pos = _color_table(data, pos, iflags)
        table = local_table if local_table is not None else global_table
        if table is None:
            raise ValueError("gif: no color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(lzw, min_code, h * w)
        if iflags & 0x40:
            idx = _deinterlace(idx, h, w)
        if idx.max(initial=0) >= len(table):
            raise ValueError("gif: pixel index outside the color table")
        return table[idx.reshape(h, w)]
    raise ValueError("gif: no image descriptor before trailer")


# ---------------------------------------------------------------------------
# encoder (tests + deterministic gate payloads)
# ---------------------------------------------------------------------------

def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    """Real GIF LZW: dictionary-building greedy longest-match; emits CLEAR
    up-front and when the table fills, EOI at the end."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset():
        return ({bytes([i]): i for i in range(clear)}, min_code_size + 1,
                end + 1)

    table, width, next_code = reset()
    emit(clear, width)
    seq = b""
    for p in idx.astype(np.uint8).tobytes():
        cand = seq + bytes([p])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder trails the encoder by exactly one table entry
            # (it adds nothing for the first code after a CLEAR), so the
            # encoder bumps one assignment later than the decoder's
            # next_code == 1<<width rule
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, width, next_code = reset()
        seq = bytes([p])
    if seq:
        emit(table[seq], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(idx: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """Minimal valid single-frame GIF89a from (h, w) palette indices and an
    (n, 3) uint8 palette (n padded to a power of two >= 2)."""
    h, w = idx.shape
    n = len(palette)
    bits = max(1, (int(n) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    body = idx
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        body = idx[np.array(rows)]
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_encode(body.reshape(-1), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
