"""FLAC codec in pure stdlib + numpy (RFC 9639 / the public FLAC format
spec): STREAMINFO parse, frame walk, and FULL PCM decode — constant /
verbatim / fixed-predictor (orders 0-4) / LPC subframes, both Rice
residual methods incl. escape partitions, wasted bits, and the
left-side / right-side / mid-side stereo decorrelations — plus a writer
(fixed predictors, order auto-selected 0-2) for deterministic gate
payloads.

Why FLAC gets native decode while MP3 stays a documented raise
(operators/mp3.py): FLAC is fully CLOSED-FORM — Rice coding, polynomial
predictors, and CRC-8/CRC-16 generators need no numeric spec tables — so
the decoder's output is checkable against ground truth: decode must
reproduce the ORIGINAL samples bit-exactly, and the STREAMINFO MD5
(computed by the writer from the source PCM, before any coding) pins the
decoder's output to the pre-encode audio. Both frame CRCs are verified on
read. Scope note: no reference FLAC implementation exists in this runtime
to certify byte-level interchange of the writer's output; the verified
claims are lossless round-trip, MD5-of-source agreement, and CRC
integrity, all asserted in tests/test_flac.py and hash-checked in the
``multimodal_real`` gate (sine-tone closed-form RMS, like the WAV lane).

Reference media model: image/audio as opaque binary + typed metadata
(SURVEY "multimodal columns"); this adds the lossless-audio family.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["encode_flac", "decode_flac", "parse_flac"]


# ---------------------------------------------------------------------------
# CRCs (generator polynomials are part of the public format definition)
# ---------------------------------------------------------------------------

def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)        # x^8 + x^2 + x + 1
_CRC16_TAB = _crc_table(0x8005, 16)    # x^16 + x^15 + x^2 + 1


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TAB[(c ^ b) & 0xFF])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TAB[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        while bits:
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            bits -= take
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


# ---------------------------------------------------------------------------
# writer (deterministic gate payloads): 16-bit PCM, fixed predictors
# ---------------------------------------------------------------------------

def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v.astype(np.int64) * 2, -v.astype(np.int64) * 2 - 1)


def _write_utf8_number(w: _BitWriter, n: int):
    if n < 0x80:
        w.write(n, 8)
    elif n < 0x800:
        w.write(0xC0 | (n >> 6), 8)
        w.write(0x80 | (n & 0x3F), 8)
    else:
        w.write(0xE0 | (n >> 12), 8)
        w.write(0x80 | ((n >> 6) & 0x3F), 8)
        w.write(0x80 | (n & 0x3F), 8)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int):
    n = len(x)
    x = x.astype(np.int64)
    if n and bool((x == x[0]).all()):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    # pick the fixed order 0-2 minimizing sum |residual|
    best, border = None, 0
    for order in range(min(3, n)):
        res = _fixed_residual(x, order)
        cost = int(np.abs(res).sum())
        if best is None or cost < best:
            best, border = cost, order
    order = border
    res = _fixed_residual(x, order)
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for i in range(order):
        w.write(int(x[i]), bps)
    # residual: rice method 0, partition order 0, one parameter
    u = _zigzag(res)
    mean = float(u.mean()) if len(u) else 0.0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    w.write(0, 2)   # coding method 0 (4-bit rice)
    w.write(0, 4)   # partition order 0
    w.write(k, 4)
    for uv in u:
        uv = int(uv)
        w.write_unary(uv >> k)
        if k:
            w.write(uv, k)


def encode_flac(samples: np.ndarray, sample_rate: int = 8000,
                block_size: int = 4096) -> bytes:
    """16-bit PCM → FLAC. ``samples``: int16 array, shape (n,) mono or
    (n, 2) stereo (stored as independent channels)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if ch not in (1, 2):
        raise ValueError(f"flac: 1 or 2 channels, got {ch}")
    bps = 16
    pcm = x.astype("<i2").tobytes()  # interleaved, as md5'd by the format
    md5 = hashlib.md5(pcm).digest()

    frames = bytearray()
    fno = 0
    min_fs = max_fs = None
    for start in range(0, n, block_size):
        blk = x[start:start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)       # reserved
        w.write(0, 1)       # fixed blocksize strategy
        w.write(0b0111, 4)  # blocksize: 16-bit at end of header
        w.write(0b1101, 4)  # sample rate: 16-bit Hz at end of header
        w.write(ch - 1, 4)  # independent channels
        w.write(0b100, 3)   # 16 bps
        w.write(0, 1)       # reserved
        _write_utf8_number(w, fno)
        w.write(bs - 1, 16)
        w.write(sample_rate, 16)
        w.align()
        hdr = w.bytes()
        w2 = _BitWriter()
        for c in range(ch):
            _write_subframe(w2, blk[:, c], bps)
        w2.align()
        body = w2.bytes()
        frame = hdr + bytes([_crc8(hdr)]) + body
        frame += struct.pack(">H", _crc16(frame))
        fs = len(frame)
        min_fs = fs if min_fs is None else min(min_fs, fs)
        max_fs = fs if max_fs is None else max(max_fs, fs)
        frames += frame
        fno += 1

    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size if n >= block_size else n, 16)
    si.write(min_fs or 0, 24)
    si.write(max_fs or 0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    meta = si.bytes() + md5
    head = b"fLaC" + bytes([0x80 | 0x00]) + struct.pack(">I", len(meta))[1:]
    return head + meta + bytes(frames)


# ---------------------------------------------------------------------------
# reader / decoder
# ---------------------------------------------------------------------------

_BS_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SR_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
            7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def parse_flac(data: bytes) -> dict:
    """STREAMINFO + metadata walk: {sample_rate, channels, bits_per_sample,
    total_samples, block_size, md5, audio_offset}."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC marker")
    pos = 4
    info = None
    while True:
        h = data[pos]
        last = bool(h & 0x80)
        btype = h & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + ln]
        if btype == 0:
            r = _BitReader(body)
            min_bs = r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            sr = r.read(20)
            ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            info = {"sample_rate": sr, "channels": ch,
                    "bits_per_sample": bps, "total_samples": total,
                    "block_size": min_bs, "md5": body[18:34]}
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("flac: no STREAMINFO block")
    info["audio_offset"] = pos
    return info


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x40
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(nbytes):
        v = (v << 6) | (r.read(8) & 0x3F)
    return v


def _read_residual(r: _BitReader, bs: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    npart = 1 << porder
    out = np.empty(bs - order, dtype=np.int64)
    w = 0
    for p in range(npart):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        k = r.read(pbits)
        if k == escape:
            nb = r.read(5)
            for i in range(cnt):
                out[w + i] = r.read_signed(nb) if nb else 0
        else:
            for i in range(cnt):
                q = r.read_unary()
                u = (q << k) | (r.read(k) if k else 0)
                out[w + i] = (u >> 1) ^ -(u & 1)  # un-zigzag
        w += cnt
    return out


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(bs, r.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([r.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, bs):
            out[i] = res[i - order] + sum(
                c * out[i - 1 - j] for j, c in enumerate(coef))
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = r.read_signed(5)
        coef = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            acc = sum(c * out[i - 1 - j] for j, c in enumerate(coef))
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    return out << wasted


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC → (int array (n, channels), sample_rate). Verifies each frame's
    header CRC-8 and footer CRC-16, and the STREAMINFO MD5 of the decoded
    stream for 8/16/24-bit audio."""
    data = bytes(data)
    info = parse_flac(data)
    pos = info["audio_offset"]
    sr_default = info["sample_rate"]
    bps_default = info["bits_per_sample"]
    chunks = []
    total = info["total_samples"]
    got = 0
    sr = sr_default
    while pos < len(data) - 2 and (not total or got < total):
        r = _BitReader(data, pos)
        if r.read(14) != 0x3FFE:
            raise ValueError(f"flac: lost frame sync at byte {pos}")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)
        _read_utf8_number(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code in _BS_CODE:
            bs = _BS_CODE[bs_code]
        elif bs_code >= 8:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError(f"flac: reserved blocksize code {bs_code}")
        if sr_code == 0:
            sr = sr_default
        elif sr_code in _SR_CODE:
            sr = _SR_CODE[sr_code]
        elif sr_code == 0b1100:
            sr = r.read(8) * 1000
        elif sr_code == 0b1101:
            sr = r.read(16)
        elif sr_code == 0b1110:
            sr = r.read(16) * 10
        else:
            raise ValueError("flac: invalid sample-rate code")
        bps = bps_default if bps_code == 0 else _BPS_CODE[bps_code]
        r.align()
        hdr_end = r.byte
        if _crc8(data[pos:hdr_end]) != data[hdr_end]:
            raise ValueError(f"flac: frame header CRC mismatch at {pos}")
        r = _BitReader(data, hdr_end + 1)
        if ch_code <= 7:
            nch = ch_code + 1
            chans = [_read_subframe(r, bs, bps) for _ in range(nch)]
        elif ch_code == 8:    # left/side
            left = _read_subframe(r, bs, bps)
            side = _read_subframe(r, bs, bps + 1)
            chans = [left, left - side]
        elif ch_code == 9:    # right/side
            side = _read_subframe(r, bs, bps + 1)
            right = _read_subframe(r, bs, bps)
            chans = [right + side, right]
        elif ch_code == 10:   # mid/side
            mid = _read_subframe(r, bs, bps)
            side = _read_subframe(r, bs, bps + 1)
            m2 = (mid << 1) | (side & 1)  # recover the dropped LSB
            left = (m2 + side) >> 1
            right = (m2 - side) >> 1
            chans = [left, right]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        r.align()
        body_end = r.byte
        (crc,) = struct.unpack(">H", data[body_end:body_end + 2])
        if _crc16(data[pos:body_end]) != crc:
            raise ValueError(f"flac: frame CRC-16 mismatch at {pos}")
        chunks.append(np.stack(chans, axis=1))
        got += bs
        pos = body_end + 2
    out = np.concatenate(chunks, axis=0) if chunks else np.empty((0, 1), np.int64)
    if total:
        out = out[:total]
    if bps_default in (8, 16, 24) and info["md5"] != b"\x00" * 16:
        dt = {8: "<i1", 16: "<i2", 24: None}[bps_default]
        if dt is not None:
            md5 = hashlib.md5(out.astype(dt).tobytes()).digest()
            if md5 != info["md5"]:
                raise ValueError("flac: decoded stream MD5 mismatch")
    return out, sr
