"""Baseline JPEG codec in pure stdlib + numpy (no Pillow/libjpeg).

Implements the ITU-T T.81 (1992) baseline sequential DCT process:

- decoder: marker walk (SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI), canonical
  Huffman decode of the entropy-coded segment with 0xFF00 byte-unstuffing
  and RSTn restart handling, dequantization, inverse zigzag, separable
  float IDCT, H×V chroma upsampling (4:4:4 / 4:2:2 / 4:2:0 via nearest
  replication per T.81 A.1.1), JFIF YCbCr→RGB.
- encoder: 4:4:4 (or grayscale) baseline with the Annex K example quant
  tables (quality-scaled per the common IJG linear mapping) and the
  Annex K typical Huffman tables.

Envelope (documented like the PNG codec in operators/multimodal.py):
baseline sequential 8-bit only — progressive (SOF2), arithmetic coding,
hierarchical, and 12-bit inputs raise ValueError naming the limitation.
The Huffman bit loop is interpreter-bound: fine for the thumbnail-scale
gate payloads this module decodes inside mapInPandas batches; swap in an
optimized codec for megapixel inputs.

Reference parity: the reference exposes no media codecs (this module
serves the driver's multimodal-pipeline mandate, like the PNG path);
spec citations are to ITU-T T.81 sections.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# T.81 Figure A.6 zigzag order: zigzag index -> natural (row-major) index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 example quantization tables (luminance / chrominance)
_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, values)
_HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
_HUFF_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II matrix C: dct2(b) = C @ b @ C.T,
    idct2(B) = C.T @ B @ C (T.81 A.3.3 float reference)."""
    k = np.arange(8.0)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    c[0, :] = 1.0
    scale = np.full((8, 1), 0.5)
    scale[0, 0] = 1.0 / (2.0 * np.sqrt(2.0))
    return c * scale


_DCT_C = _dct_matrix()


# ---------------------------------------------------------------------------
# Canonical Huffman (T.81 Annex C): code assignment by ascending length
# ---------------------------------------------------------------------------

def _build_decode_table(bits, values):
    """{(length, code): symbol} plus per-length (min_code, max_code, base)
    for the fast range check used by the decoder (T.81 F.2.2.3)."""
    code = 0
    idx = 0
    per_len = {}
    for ln in range(1, 17):
        n = bits[ln - 1]
        if n:
            per_len[ln] = (code, code + n - 1, idx)
            idx += n
            code += n
        code <<= 1
    return per_len, list(values)


def _build_encode_table(bits, values):
    """{symbol: (code, length)}."""
    out = {}
    code = 0
    idx = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[idx]] = (code, ln)
            idx += 1
            code += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over the UNSTUFFED entropy bytes."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.bitcnt = 0

    def read_bit(self) -> int:
        if self.bitcnt == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy data exhausted mid-block")
            self.bitbuf = self.data[self.pos]
            self.pos += 1
            self.bitcnt = 8
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.bitcnt = 0


def _huff_decode(br: _BitReader, table) -> int:
    per_len, values = table
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        rng = per_len.get(ln)
        if rng is not None and rng[0] <= code <= rng[1]:
            return values[rng[2] + (code - rng[0])]
    raise ValueError("JPEG: invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB from a baseline
    sequential 8-bit JPEG/JFIF payload. See module docstring for the
    envelope; malformed inputs raise ValueError."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    sof = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if pos + 2 + seglen > len(data):
            raise ValueError(f"JPEG: truncated segment 0xFF{marker:02X}")
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                b += 1
                if pq == 0:
                    tbl = np.frombuffer(body[b : b + 64], dtype=np.uint8).astype(np.int32)
                    b += 64
                elif pq == 1:
                    tbl = np.frombuffer(body[b : b + 128], dtype=">u2").astype(np.int32)
                    b += 128
                else:
                    raise ValueError(f"JPEG: bad DQT precision {pq}")
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                values = list(body[b + 17 : b + 17 + n])
                b += 17 + n
                tbl = _build_decode_table(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"JPEG: only 8-bit precision supported, got {prec}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            sof = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = {0xC2: "progressive (SOF2)"}.get(marker, f"SOF{marker - 0xC0}")
            raise ValueError(
                f"JPEG: only baseline sequential (SOF0) supported, got {kind}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scomps = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append({"id": cid, "dc": tt >> 4, "ac": tt & 0xF})
            if sof is None:
                raise ValueError("JPEG: SOS before SOF0")
            return _decode_scan(data, pos, sof, scomps, qt, huff_dc, huff_ac,
                                restart_interval)
        # APPn / COM / others: skipped
    raise ValueError("JPEG: no SOS marker found")


def _decode_scan(data, pos, sof, scomps, qt, huff_dc, huff_ac, restart_interval):
    """Un-stuff the entropy-coded segment (0xFF00 → 0xFF), splitting at
    RSTn markers into restart intervals (T.81 F.2.1.3.1: each interval is
    independently byte-aligned with DC predictors reset)."""
    intervals: list[bytes] = []
    out = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
            # fill bytes (FF FF ... D0 is still an RST0). Skip the fill run
            # before classifying the terminator byte.
            j = i + 1
            while j < n and data[j] == 0xFF:
                j += 1
            nxt = data[j] if j < n else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                i = j + 1
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn boundary
                intervals.append(bytes(out))
                out = bytearray()
                i = j + 1
                continue
            break  # EOI or the next real marker
        out.append(b)
        i += 1
    intervals.append(bytes(out))
    return _entropy_decode(intervals, sof, scomps, qt, huff_dc, huff_ac,
                           restart_interval)


def _entropy_decode(intervals, sof, scomps, qt, huff_dc, huff_ac,
                    restart_interval):
    h, w = sof["h"], sof["w"]
    comps = sof["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    # per-component pixel planes at that component's sampling resolution
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    order = []  # (comp, dc_table, ac_table) per block within one MCU
    for sc in scomps:
        c = by_id.get(sc["id"])
        if c is None:
            raise ValueError(f"JPEG: SOS component {sc['id']} not in SOF0")
        if sc["dc"] not in huff_dc or sc["ac"] not in huff_ac:
            raise ValueError("JPEG: SOS references an undefined Huffman table")
        if c["tq"] not in qt:
            raise ValueError("JPEG: SOF0 references an undefined quant table")
        order.append((c, huff_dc[sc["dc"]], huff_ac[sc["ac"]]))

    interval_len = restart_interval if restart_interval else n_mcu
    mcu_done = 0
    for seg in intervals:
        if mcu_done >= n_mcu:
            break
        br = _BitReader(seg)
        preds = {c["id"]: 0 for c in comps}
        seg_mcus = min(interval_len, n_mcu - mcu_done)
        for k in range(seg_mcus):
            m = mcu_done + k
            my, mx = divmod(m, mcux)
            for c, dct, act in order:
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(br, dct)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        kk = 1
                        while kk < 64:
                            rs = _huff_decode(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    kk += 16
                                    continue
                                break  # EOB
                            kk += r
                            if kk > 63:
                                raise ValueError("JPEG: AC index overrun")
                            zz[kk] = _extend(br.read_bits(s), s)
                            kk += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZIGZAG] = zz * q
                        pix = _DCT_C.T @ blk.reshape(8, 8) @ _DCT_C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = pix
        mcu_done += seg_mcus
    if mcu_done < n_mcu:
        raise ValueError(
            f"JPEG: entropy data covers {mcu_done} of {n_mcu} MCUs")

    # upsample each plane to full resolution (nearest replication) and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise ValueError(f"JPEG: unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg_size(data: bytes) -> tuple:
    """(h, w, ncomp) from the SOF0 header without full decode."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: bad marker stream")
        marker = data[pos + 1]
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xC0:
            body = data[pos + 4 : pos + 2 + seglen]
            h, w = struct.unpack_from(">HH", body, 1)
            return h, w, body[5]
        pos += 2 + seglen
    raise ValueError("JPEG: no SOF0 header")


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4 or grayscale, Annex K tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "bitbuf", "bitcnt")

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.bitcnt = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.bitbuf = (self.bitbuf << 1) | ((code >> i) & 1)
            self.bitcnt += 1
            if self.bitcnt == 8:
                b = self.bitbuf & 0xFF
                self.out.append(b)
                if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                    self.out.append(0x00)
                self.bitbuf = 0
                self.bitcnt = 0

    def pad_align(self) -> None:
        if self.bitcnt:
            self.write((1 << (8 - self.bitcnt)) - 1, 8 - self.bitcnt)  # 1-pad

    def restart(self, n: int) -> None:
        """Byte-align then emit RSTn (T.81 F.1.2.3; not subject to stuffing)."""
        self.pad_align()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG linear quality scaling of an Annex K table (public mapping)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, blk, qzz, dc_tab, ac_tab, pred):
    """qzz: quant table in ZIGZAG order (the DQT file order)."""
    coef = _DCT_C @ (blk - 128.0) @ _DCT_C.T
    zz = np.round(coef.reshape(64)[_ZIGZAG] / qzz).astype(np.int64)
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _pad_to(p: np.ndarray, hh: int, ww: int) -> np.ndarray:
    """Edge-replicate pad a plane to (hh, ww) (standard practice for the
    partial boundary blocks T.81 A.2.1 leaves implementation-defined)."""
    h, w = p.shape
    pp = np.empty((hh, ww), dtype=np.float64)
    pp[:h, :w] = p
    if hh > h:
        pp[h:, :w] = p[h - 1 : h, :]
    if ww > w:
        pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG bytes from (h, w) gray or (h, w, 3) RGB uint8.

    ``subsample``: "444" (no chroma subsampling) or "420" (2x2 box-averaged
    chroma, the common camera default). ``restart_interval``: emit RSTn
    every N MCUs (DRI; 0 = none). Annex K tables scaled by ``quality``
    (IJG linear mapping). Lossy: decode(encode(x)) approximates x within
    quantization error."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(f"encode_jpeg: expected (h,w), (h,w,1) or (h,w,3), got {img.shape}")
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg: expected uint8 pixels")
    if subsample not in ("444", "420"):
        raise ValueError(f"encode_jpeg: subsample must be '444' or '420', got {subsample!r}")
    h, w, nch = img.shape
    f = img.astype(np.float64)
    # components: (plane, H, V, quant_idx, huff_idx)
    if nch == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            h2, w2 = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = _pad_to(cb, h2, w2).reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            crp = _pad_to(cr, h2, w2).reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            comps = [(y, 2, 2, 0, 0), (cbp, 1, 1, 1, 1), (crp, 1, 1, 1, 1)]
        else:
            comps = [(y, 1, 1, 0, 0), (cb, 1, 1, 1, 1), (cr, 1, 1, 1, 1)]
    else:
        comps = [(f[:, :, 0], 1, 1, 0, 0)]
    # tables are defined in natural order; DQT bodies and quantization run
    # in ZIGZAG (file) order per T.81 B.2.4.1
    q0 = _scaled_quant(_QUANT_LUM, quality)[_ZIGZAG]
    q1 = _scaled_quant(_QUANT_CHROM, quality)[_ZIGZAG]
    qtabs = [q0, q1]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q0))
    if nch == 3:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(x) for x in q1))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for i, (_, ch, cv, cq, _) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, cq])
    out += _seg(0xC0, sof)

    def dht(tc, th, spec):
        bits, values = spec
        return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(values))

    out += dht(0, 0, _HUFF_DC_LUM) + dht(1, 0, _HUFF_AC_LUM)
    if nch == 3:
        out += dht(0, 1, _HUFF_DC_CHROM) + dht(1, 1, _HUFF_AC_CHROM)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i, (_, _, _, _, ht) in enumerate(comps):
        sos += bytes([i + 1, (ht << 4) | ht])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    enc_dc = [_build_encode_table(*_HUFF_DC_LUM), _build_encode_table(*_HUFF_DC_CHROM)]
    enc_ac = [_build_encode_table(*_HUFF_AC_LUM), _build_encode_table(*_HUFF_AC_CHROM)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        (_pad_to(p, mcuy * cv * 8, mcux * ch * 8), ch, cv, cq, ht)
        for (p, ch, cv, cq, ht) in comps
    ]
    bw = _BitWriter()
    preds = [0] * len(comps)
    rst_n = 0
    since_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since_rst == restart_interval:
                bw.restart(rst_n)
                rst_n = (rst_n + 1) & 7
                since_rst = 0
                preds = [0] * len(comps)
            for ci, (p, ch, cv, cq, ht) in enumerate(padded):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, blk, qtabs[cq], enc_dc[ht], enc_ac[ht],
                            preds[ci])
            since_rst += 1
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
