"""JPEG codec in pure stdlib + numpy (no Pillow/libjpeg).

Implements the ITU-T T.81 (1992) baseline sequential AND progressive DCT
processes:

- decoder: marker walk (SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF2/SOS/EOI),
  canonical Huffman decode of the entropy-coded segment with 0xFF00
  byte-unstuffing and RSTn restart handling, dequantization, inverse
  zigzag, separable float IDCT, H×V chroma upsampling (4:4:4 / 4:2:2 /
  4:2:0 via nearest replication per T.81 A.1.1), JFIF YCbCr→RGB.
  Progressive (SOF2, Annex G.2): multi-scan coefficient accumulation with
  spectral selection (per-band AC scans, interleaved or single-component
  DC scans) and successive approximation (DC appended-bit refinement, AC
  correction-bit refinement with EOBn run codes), then one batched IDCT.
- encoder: 4:4:4 / 4:2:0 (or grayscale) with the Annex K example quant
  tables (quality-scaled per the common IJG linear mapping); baseline with
  the Annex K typical Huffman tables, or ``progressive=True`` emitting a
  spectral-selection + successive-approximation scan script whose decoded
  output is bit-identical to the baseline encoding's (same coefficients).

Envelope (documented like the PNG codec in operators/multimodal.py):
8-bit Huffman processes only — arithmetic coding, hierarchical, and 12-bit
inputs raise ValueError naming the limitation. The Huffman bit loop is
interpreter-bound: fine for the thumbnail-scale gate payloads this module
decodes inside mapInPandas batches; swap in an optimized codec for
megapixel inputs.

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
    sequential (SOF0) or progressive (SOF2, spectral selection +
    successive approximation, T.81 Annex G.2) 8-bit JPEG/JFIF payload.
    See module docstring for the envelope; malformed inputs raise
    ValueError."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    sof = None
    restart_interval = 0
    progressive = False
    coefs = None  # progressive: per-component accumulated coefficients
    n_scans = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at offset {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2 fill bytes before the marker byte
        marker = data[pos + 1] if pos + 1 < len(data) else 0xD9
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(data):
            raise ValueError(f"JPEG: truncated segment 0xFF{marker:02X}")
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, ncomp = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"JPEG: only 8-bit precision supported, got {prec}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            sof = {"h": h, "w": w, "comps": comps}
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = ("arithmetic-coded" if marker in (0xC9, 0xCA, 0xCB, 0xCD,
                                                     0xCE, 0xCF) else "") or \
                f"SOF{marker - 0xC0}"
            raise ValueError(
                "JPEG: only baseline sequential (SOF0) and progressive "
                f"(SOF2) supported, got {kind}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scomps = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append({"id": cid, "dc": tt >> 4, "ac": tt & 0xF})
            if sof is None:
                raise ValueError("JPEG: SOS before SOF")
            if not progressive:
                return _decode_scan(data, pos, sof, scomps, qt, huff_dc,
                                    huff_ac, restart_interval)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            if coefs is None:
                coefs = _alloc_coefs(sof)
            intervals, end = _split_entropy(data, pos)
            _progressive_scan(intervals, sof, scomps, ss, se, ah, al,
                              huff_dc, huff_ac, restart_interval, coefs)
            n_scans += 1
            pos = end
        # APPn / COM / others: skipped
    if progressive and n_scans:
        planes = _idct_planes(coefs, sof, qt)
        return _planes_to_image(planes, sof)
    raise ValueError("JPEG: no SOS marker found")


def _split_entropy(data, pos):
    """Un-stuff the entropy-coded segment (0xFF00 → 0xFF), splitting at
    RSTn markers into restart intervals (T.81 F.2.1.3.1: each interval is
    independently byte-aligned with DC predictors reset). Returns
    (intervals, end) where ``end`` is the offset of the first byte of the
    marker that terminated the scan (so a progressive multi-scan walk can
    resume marker parsing there)."""
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
    return intervals, min(i, n)


def _decode_scan(data, pos, sof, scomps, qt, huff_dc, huff_ac, restart_interval):
    intervals, _ = _split_entropy(data, pos)
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

    return _planes_to_image(planes, sof)


def _planes_to_image(planes, sof):
    """Upsample each component plane to full resolution (nearest
    replication per T.81 A.1.1), crop, and JFIF YCbCr→RGB convert."""
    h, w = sof["h"], sof["w"]
    comps = sof["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
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


# ---------------------------------------------------------------------------
# Progressive decoding (T.81 Annex G.2: spectral selection + successive
# approximation over the same canonical-Huffman / IDCT core)
# ---------------------------------------------------------------------------

def _mcu_geometry(sof):
    comps = sof["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-sof["w"] // (8 * hmax))
    mcuy = -(-sof["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _alloc_coefs(sof):
    """Per-component accumulated DCT coefficients in ZIGZAG order, on the
    MCU-padded block grid (blocks_y, blocks_x, 64)."""
    _, _, mcux, mcuy = _mcu_geometry(sof)
    return {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
            for c in sof["comps"]}


def _comp_blocks_used(sof, c):
    """Block grid for a NON-interleaved scan (T.81 A.2.2): ceil of the
    component's own sample dimensions / 8 — may be smaller than the
    MCU-padded allocation grid."""
    hmax, vmax, _, _ = _mcu_geometry(sof)
    cw = -(-sof["w"] * c["h"] // hmax)
    ch = -(-sof["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _progressive_scan(intervals, sof, scomps, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval, coefs):
    """Apply one progressive scan to the accumulated coefficient store.

    DC scans (Ss=Se=0) may be interleaved (MCU walk, ns>=1) or single
    component; AC scans must be single-component (T.81 G.1.1.1). Ah=0 is a
    first scan, Ah>0 a successive-approximation refinement. Restart
    intervals reset DC predictors AND the EOB run."""
    comps = sof["comps"]
    by_id = {c["id"]: c for c in comps}
    _, _, mcux, mcuy = _mcu_geometry(sof)
    order = []
    for sc in scomps:
        c = by_id.get(sc["id"])
        if c is None:
            raise ValueError(f"JPEG: SOS component {sc['id']} not in SOF")
        order.append((c, sc))

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("JPEG: progressive scan with Ss=0 must have Se=0")
        tables = {}
        for c, sc in order:
            if ah == 0:
                if sc["dc"] not in huff_dc:
                    raise ValueError("JPEG: SOS references an undefined Huffman table")
                tables[c["id"]] = huff_dc[sc["dc"]]
        interleaved = len(order) > 1
        if interleaved:
            n_units = mcux * mcuy
        else:
            bh, bw = _comp_blocks_used(sof, order[0][0])
            n_units = bh * bw
        interval_len = restart_interval if restart_interval else n_units
        done = 0
        for seg in intervals:
            if done >= n_units:
                break
            br = _BitReader(seg)
            preds = {c["id"]: 0 for c, _ in order}
            k_units = min(interval_len, n_units - done)
            for u in range(k_units):
                m = done + u
                if interleaved:
                    my, mx = divmod(m, mcux)
                    for c, sc in order:
                        for byy in range(c["v"]):
                            for bxx in range(c["h"]):
                                blk = coefs[c["id"]][my * c["v"] + byy,
                                                     mx * c["h"] + bxx]
                                _dc_unit(br, blk, tables.get(c["id"]),
                                         preds, c, ah, al)
                else:
                    c, sc = order[0]
                    byy, bxx = divmod(m, bw)
                    _dc_unit(br, coefs[c["id"]][byy, bxx],
                             tables.get(c["id"]), preds, c, ah, al)
            done += k_units
        if done < n_units:
            raise ValueError(f"JPEG: entropy data covers {done} of {n_units} units")
        return

    # AC scan: exactly one component (T.81 G.1.1.1)
    if len(order) != 1:
        raise ValueError("JPEG: progressive AC scan must have exactly one component")
    c, sc = order[0]
    if sc["ac"] not in huff_ac:
        raise ValueError("JPEG: SOS references an undefined Huffman table")
    act = huff_ac[sc["ac"]]
    if not (1 <= ss <= se <= 63):
        raise ValueError(f"JPEG: bad spectral band Ss={ss} Se={se}")
    bh, bw = _comp_blocks_used(sof, c)
    arr = coefs[c["id"]]
    n_units = bh * bw
    interval_len = restart_interval if restart_interval else n_units
    done = 0
    for seg in intervals:
        if done >= n_units:
            break
        br = _BitReader(seg)
        eobrun = 0
        k_units = min(interval_len, n_units - done)
        for u in range(k_units):
            byy, bxx = divmod(done + u, bw)
            blk = arr[byy, bxx]
            if ah == 0:
                eobrun = _ac_first(br, blk, act, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(br, blk, act, ss, se, al, eobrun)
        done += k_units
    if done < n_units:
        raise ValueError(f"JPEG: entropy data covers {done} of {n_units} units")


def _dc_unit(br, blk, dct, preds, c, ah, al):
    if ah == 0:  # first DC scan: baseline diff coding of (DC >> Al)
        t = _huff_decode(br, dct)
        diff = _extend(br.read_bits(t), t) if t else 0
        preds[c["id"]] += diff
        blk[0] = preds[c["id"]] << al
    else:  # refinement: one appended magnitude bit (T.81 G.2.1)
        if br.read_bit():
            blk[0] |= 1 << al


def _ac_first(br, blk, act, ss, se, al, eobrun):
    """First AC scan of a band (Ah=0): baseline run/size coding of the
    point-transformed coefficients plus EOBn run codes (T.81 G.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: current block ends here
            if r:
                eobrun += br.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("JPEG: AC index overrun in progressive scan")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(br, blk, act, ss, se, al, eobrun):
    """AC refinement scan (Ah>0): each already-nonzero coefficient in the
    band receives one correction bit; run/size codes position newly
    significant coefficients of magnitude 1 (T.81 G.2.2 correction-bit
    procedure)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "JPEG: invalid magnitude in AC refinement scan")
                val = p1 if br.read_bit() else m1
            # advance past r zero-history positions, applying correction
            # bits to already-nonzero coefficients along the way
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                blk[k] = val
            if k <= se:
                k += 1
    if eobrun > 0:
        # EOB: correction bits still flow to the remaining nonzero coefs
        while k <= se:
            if blk[k] != 0:
                if br.read_bit() and (int(blk[k]) & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _idct_planes(coefs, sof, qt):
    """Dequantize + inverse-zigzag + batched IDCT every accumulated block
    (one einsum per component, not per block)."""
    planes = {}
    for c in sof["comps"]:
        if c["tq"] not in qt:
            raise ValueError("JPEG: SOF references an undefined quant table")
        q = qt[c["tq"]].astype(np.float64)
        arr = coefs[c["id"]]
        bh, bw = arr.shape[:2]
        zz = arr.reshape(bh * bw, 64).astype(np.float64) * q
        nat = np.zeros_like(zz)
        nat[:, _ZIGZAG] = zz
        pix = np.einsum("ij,njk,kl->nil", _DCT_C.T,
                        nat.reshape(-1, 8, 8), _DCT_C) + 128.0
        planes[c["id"]] = pix.reshape(bh, bw, 8, 8).transpose(
            0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return planes


def decode_jpeg_size(data: bytes) -> tuple:
    """(h, w, ncomp) from the SOF0/SOF2 header without full decode."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: bad marker stream")
        marker = data[pos + 1]
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker in (0xC0, 0xC2):
            body = data[pos + 4 : pos + 2 + seglen]
            h, w = struct.unpack_from(">HH", body, 1)
            return h, w, body[5]
        pos += 2 + seglen
    raise ValueError("JPEG: no SOF0/SOF2 header")


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


# Progressive AC scans need EOBn symbols (0x10..0xE0), which the Annex K
# AC tables do not define. One flat canonical table with every (r, s) pair
# r=0..15, s=0..10 at code length 8 (176 symbols < 256, Kraft-valid, no
# all-ones code) keeps the encoder simple; payload sizes here don't need
# optimal tables.
_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


class _ProgACWriter:
    """Cross-block AC scan state (T.81 G.1.2.2): a pending EOB run plus the
    two correction-bit buffers a refinement scan needs — bits attached to
    the pending run (flushed with the EOBn symbol) and bits buffered within
    the current block (flushed after that block's next run/size symbol)."""

    __slots__ = ("bw", "ac", "eobrun", "run_corr", "corr")

    def __init__(self, bw, ac_tab):
        self.bw = bw
        self.ac = ac_tab
        self.eobrun = 0
        self.run_corr: list[int] = []  # correction bits owned by the run
        self.corr: list[int] = []  # correction bits of the current block

    def emit_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.run_corr:
            self.bw.write(b, 1)
        self.run_corr = []

    def flush_corr(self):
        for b in self.corr:
            self.bw.write(b, 1)
        self.corr = []

    def end_block(self, r):
        """Block produced no further symbols: fold trailing zeros and any
        buffered correction bits into the EOB run."""
        if r > 0 or self.corr:
            self.eobrun += 1
            self.run_corr.extend(self.corr)
            self.corr = []
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()


def _enc_dc_scan(bw, zzs, comps, enc_dc, ah, al, restart_interval):
    """One progressive DC scan (interleaved over all components).
    Ah=0: diff coding of DC >> Al (arithmetic shift, G.1.2.1);
    Ah>0: one appended magnitude bit per block."""
    cv0, ch0 = comps[0][1], comps[0][0]
    mcuy = zzs[0].shape[0] // cv0
    mcux = zzs[0].shape[1] // ch0
    preds = [0] * len(zzs)
    rst = 0
    since = 0
    for m in range(mcux * mcuy):
        if restart_interval and since == restart_interval:
            bw.restart(rst)
            rst = (rst + 1) & 7
            since = 0
            preds = [0] * len(zzs)
        my, mx = divmod(m, mcux)
        for ci, (zz, (ch, cv, cq, ht)) in enumerate(zip(zzs, comps)):
            for by in range(cv):
                for bx in range(ch):
                    v = int(zz[my * cv + by, mx * ch + bx, 0])
                    if ah == 0:
                        d = (v >> al) - preds[ci]
                        preds[ci] = v >> al
                        t = _category(d)
                        code, ln = enc_dc[ht][t]
                        bw.write(code, ln)
                        if t:
                            bw.write(d if d > 0 else d + (1 << t) - 1, t)
                    else:
                        bw.write((v >> al) & 1, 1)
        since += 1


def _enc_ac_first_scan(bw, zz, ss, se, al, ac_tab, restart_interval):
    """First AC scan of a band: run/size coding of |coef| >> Al with sign,
    EOBn codes for runs of band-empty blocks (G.1.2.2)."""
    bh, bwid = zz.shape[:2]
    pw = _ProgACWriter(bw, ac_tab)
    rst = 0
    since = 0
    for m in range(bh * bwid):
        if restart_interval and since == restart_interval:
            pw.emit_eobrun()
            bw.restart(rst)
            rst = (rst + 1) & 7
            since = 0
        byy, bxx = divmod(m, bwid)
        blk = zz[byy, bxx]
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = (-v if v < 0 else v) >> al
            if t == 0:
                r += 1
                continue
            pw.emit_eobrun()
            while r > 15:
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                r -= 16
            s = t.bit_length()
            sv = t if v > 0 else -t
            code, ln = ac_tab[(r << 4) | s]
            bw.write(code, ln)
            bw.write(sv if sv > 0 else sv + (1 << s) - 1, s)
            r = 0
        pw.end_block(r)
        since += 1
    pw.emit_eobrun()


def _enc_ac_refine_scan(bw, zz, ss, se, al, ac_tab, restart_interval):
    """AC refinement scan: correction bits for already-nonzero coefficients,
    run/size symbols (s=1 only) positioning newly significant magnitude-1
    coefficients (G.1.2.3). Correction bits buffered within the current
    block flush after its next symbol; bits from band-empty blocks attach
    to the pending EOB run (libjpeg's BE/BR split, re-derived from the
    decoder's consumption order)."""
    bh, bwid = zz.shape[:2]
    pw = _ProgACWriter(bw, ac_tab)
    rst = 0
    since = 0
    for m in range(bh * bwid):
        if restart_interval and since == restart_interval:
            pw.emit_eobrun()
            bw.restart(rst)
            rst = (rst + 1) & 7
            since = 0
        byy, bxx = divmod(m, bwid)
        blk = zz[byy, bxx]
        absv = [(-int(v) if v < 0 else int(v)) >> al for v in blk[ss:se + 1]]
        eob = -1  # band-relative index of the last newly-significant coef
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        r = 0
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                pw.emit_eobrun()
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                r -= 16
                pw.flush_corr()
            if t > 1:  # already significant: one correction bit
                pw.corr.append(t & 1)
                continue
            # newly significant (magnitude exactly 1 at this approximation)
            pw.emit_eobrun()
            code, ln = ac_tab[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if int(blk[ss + i]) > 0 else 0, 1)
            pw.flush_corr()
            r = 0
        pw.end_block(r)
        since += 1
    pw.emit_eobrun()


def _quantized_blocks(padded, qtabs):
    """Per component: (bh, bw, 64) int64 ZIGZAG-order quantized DCT
    coefficients (batched einsum, same math as _encode_block)."""
    out = []
    for (p, ch, cv, cq, ht) in padded:
        hh, ww = p.shape
        bh, bwid = hh // 8, ww // 8
        blocks = p.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coef = np.einsum("ij,njk,kl->nil", _DCT_C, blocks - 128.0, _DCT_C.T)
        zz = np.round(coef.reshape(-1, 64)[:, _ZIGZAG] / qtabs[cq]).astype(np.int64)
        out.append(zz.reshape(bh, bwid, 64))
    return out


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: str = "444",
                restart_interval: int = 0, progressive: bool = False) -> bytes:
    """Baseline (SOF0) or progressive (SOF2) JPEG bytes from (h, w) gray
    or (h, w, 3) RGB uint8.

    ``subsample``: "444" (no chroma subsampling) or "420" (2x2 box-averaged
    chroma, the common camera default). ``restart_interval``: emit RSTn
    every N MCUs (DRI; 0 = none). ``progressive``: emit a spectral-selection
    + successive-approximation scan script (DC Al=1 → AC bands 1-5 / 6-63 at
    Al=2 → AC refinements Al=1, Al=0 → DC refinement) — same quantized
    coefficients as baseline, so the decoded image is bit-identical to the
    baseline encoding's. Annex K tables scaled by ``quality`` (IJG linear
    mapping). Lossy: decode(encode(x)) approximates x within quantization
    error."""
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
    out += _seg(0xC2 if progressive else 0xC0, sof)

    def dht(tc, th, spec):
        bits, values = spec
        return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(values))

    if progressive:
        out += dht(0, 0, _HUFF_DC_LUM) + dht(1, 0, _HUFF_AC_PROG)
        if nch == 3:
            out += dht(0, 1, _HUFF_DC_CHROM)
    else:
        out += dht(0, 0, _HUFF_DC_LUM) + dht(1, 0, _HUFF_AC_LUM)
        if nch == 3:
            out += dht(0, 1, _HUFF_DC_CHROM) + dht(1, 1, _HUFF_AC_CHROM)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        (_pad_to(p, mcuy * cv * 8, mcux * ch * 8), ch, cv, cq, ht)
        for (p, ch, cv, cq, ht) in comps
    ]

    if progressive:
        enc_dc = [_build_encode_table(*_HUFF_DC_LUM),
                  _build_encode_table(*_HUFF_DC_CHROM)]
        enc_ac_prog = _build_encode_table(*_HUFF_AC_PROG)
        zzs = _quantized_blocks(padded, qtabs)
        specs = [(ch, cv, cq, ht) for (_, ch, cv, cq, ht) in padded]

        def sos_seg(comp_ids, ss, se, ah, al):
            body = bytes([len(comp_ids)])
            for i in comp_ids:
                ht = specs[i][3]
                body += bytes([i + 1, (ht << 4) | 0])  # Td=ht, Ta=0 (prog AC)
            return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

        def run_scan(comp_ids, ss, se, ah, al):
            nonlocal out
            out += sos_seg(comp_ids, ss, se, ah, al)
            bw = _BitWriter()
            if ss == 0:
                _enc_dc_scan(bw, [zzs[i] for i in comp_ids],
                             [specs[i] for i in comp_ids], enc_dc, ah, al,
                             restart_interval)
            else:
                (i,) = comp_ids
                c = {"h": specs[i][0], "v": specs[i][1]}
                sof_d = {"h": h, "w": w,
                         "comps": [{"h": s[0], "v": s[1]} for s in specs]}
                bh, bwid = _comp_blocks_used(sof_d, c)
                zz = zzs[i][:bh, :bwid]
                if ah == 0:
                    _enc_ac_first_scan(bw, zz, ss, se, al, enc_ac_prog,
                                       restart_interval)
                else:
                    _enc_ac_refine_scan(bw, zz, ss, se, al, enc_ac_prog,
                                        restart_interval)
            out += bw.flush()

        all_ids = list(range(len(comps)))
        run_scan(all_ids, 0, 0, 0, 1)  # DC first, Al=1
        for i in all_ids:
            run_scan([i], 1, 5, 0, 2)  # low AC band first, Al=2
        for i in all_ids:
            run_scan([i], 6, 63, 0, 2)  # high AC band first, Al=2
        for i in all_ids:
            run_scan([i], 1, 63, 2, 1)  # AC refinement Al=1
        for i in all_ids:
            run_scan([i], 1, 63, 1, 0)  # AC refinement Al=0
        run_scan(all_ids, 0, 0, 1, 0)  # DC refinement
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    sos = bytes([len(comps)])
    for i, (_, _, _, _, ht) in enumerate(comps):
        sos += bytes([i + 1, (ht << 4) | ht])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    enc_dc = [_build_encode_table(*_HUFF_DC_LUM), _build_encode_table(*_HUFF_DC_CHROM)]
    enc_ac = [_build_encode_table(*_HUFF_AC_LUM), _build_encode_table(*_HUFF_AC_CHROM)]
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
