"""MP3 (MPEG-1/2 Audio Layer III) frame-header parser in pure stdlib:
ID3v2 tag skip, sync-word frame walk, bitrate/sample-rate table decode,
per-frame size arithmetic, and stream-level metadata (frame count,
duration, average bitrate, channel mode) — the typed-metadata side of the
reference's opaque-binary audio model. DECODING Layer III audio (Huffman
spectral data + IMDCT + synthesis filterbank) requires a real codec and
raises NotImplementedError naming it.

A minimal writer (`encode_mp3_frames`) builds structurally valid streams
(correct headers + deterministic junk payloads) so tests and the gate can
certify the walk: any error in the ID3 skip, the bitrate table, or the
size formula desynchronizes the walk and changes every downstream number.
"""

from __future__ import annotations

import hashlib

# bitrate kbps tables, Layer III: index 1..14 (0=free, 15=bad)
_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                  256, 320]
_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                  160]
_SAMPLE_RATE = {  # by version key
    3: [44100, 48000, 32000],   # MPEG-1
    2: [22050, 24000, 16000],   # MPEG-2
    0: [11025, 12000, 8000],    # MPEG-2.5
}


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
        | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


def _frame_at(data: bytes, pos: int):
    """(frame_size, samples_per_frame, bitrate_kbps, sample_rate,
    channels) for the header at ``pos``, or None if not a valid L3 sync."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos:pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x3           # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b1 >> 1) & 0x3             # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3
    channels = 1 if mode == 3 else 2
    sr = _SAMPLE_RATE[version][sr_idx]
    if version == 3:
        kbps = _BITRATE_V1_L3[br_idx]
        spf = 1152
        size = (144 * kbps * 1000) // sr + padding
    else:
        kbps = _BITRATE_V2_L3[br_idx]
        spf = 576
        size = (72 * kbps * 1000) // sr + padding
    return size, spf, kbps, sr, channels


def parse_mp3(data: bytes) -> dict:
    """Walk every frame: {n_frames, duration_s, sample_rate, channels,
    avg_bitrate_kbps, total_audio_bytes, id3_bytes, vbr}."""
    data = bytes(data)
    pos = _skip_id3v2(data)
    id3 = pos
    n = 0
    total_samples = 0
    total_bytes = 0
    kbps_sum = 0
    rates = set()
    kbps_set = set()
    channels = 0
    while pos + 4 <= len(data):
        fr = _frame_at(data, pos)
        if fr is None:
            if n == 0:
                pos += 1  # scan for first sync (garbage prefix tolerance)
                continue
            break
        size, spf, kbps, sr, ch = fr
        if pos + size > len(data):
            break
        n += 1
        total_samples += spf
        total_bytes += size
        kbps_sum += kbps
        rates.add(sr)
        kbps_set.add(kbps)
        channels = ch
        pos += size
    if n == 0:
        raise ValueError("mp3: no Layer III frames found")
    if len(rates) != 1:
        raise ValueError(f"mp3: mixed sample rates {sorted(rates)}")
    sr = rates.pop()
    return {
        "n_frames": n,
        "duration_s": total_samples / sr,
        "sample_rate": sr,
        "channels": channels,
        "avg_bitrate_kbps": kbps_sum / n,
        "total_audio_bytes": total_bytes,
        "id3_bytes": id3,
        "vbr": len(kbps_set) > 1,
    }


def decode_mp3(data: bytes):
    """Layer III PCM decode — MEASURED DESCOPE (r9, VERDICT r8 item 5).

    The decode chain (Huffman spectral data -> requantize -> alias
    reduction -> IMDCT -> polyphase synthesis) is implementable in numpy,
    but its correctness rests on ISO 11172-3 Annex B's NUMERIC tables: the
    32 big-value Huffman code tables (~2,000 codewords) and the 512-tap
    synthesis window D, neither of which has a closed form. Without the
    spec text in this runtime those tables would have to be transcribed
    from memory, and the only available validator would be an encoder
    built from the same remembered tables — a matched-bug round-trip that
    proves self-consistency, not conformance (a transposed codeword or a
    mis-signed window tap cancels in both directions and still
    reconstructs a sine). That is weaker than every other hash-checked
    claim in this repo, so the envelope stays an explicit raise. What IS
    native: the full frame walk, bitrate/sample-rate tables (small enough
    to state reliably), duration/VBR metadata, and exact coded-frame
    extraction (parse_mp3). For a mainstream audio family with PCM decode
    that can be verified against ground truth, see operators/flac.py —
    FLAC is fully closed-form (Rice coding + fixed/LPC predictors + CRCs),
    losslessly round-trips, and its STREAMINFO MD5 pins the decoded PCM to
    the original samples."""
    raise NotImplementedError(
        "decoding MPEG Layer III audio requires the ISO 11172-3 Annex B "
        "numeric tables (32 Huffman tables, 512-tap synthesis window) or "
        "a codec (ffmpeg/libmpg123), neither present in this runtime; "
        "frame-header metadata parsing is native (parse_mp3), and FLAC "
        "(operators/flac.py) provides verifiable native PCM decode")


# ---------------------------------------------------------------------------
# minimal writer (tests + deterministic gate streams)
# ---------------------------------------------------------------------------

_BR_INDEX_V1 = {v: i for i, v in enumerate(_BITRATE_V1_L3)}
_SR_INDEX_V1 = {44100: 0, 48000: 1, 32000: 2}


def encode_mp3_frames(seed: str, n_frames: int,
                      kbps_cycle: tuple[int, ...] = (128, 160, 192),
                      sample_rate: int = 44100,
                      id3_junk: int = 0) -> bytes:
    """Structurally valid MPEG-1 Layer III stream: frame k uses
    kbps_cycle[k % len], mono, no padding; payload bytes are an md5 chain
    of (seed, k) so the stream is deterministic. Optional ID3v2 tag of
    ``id3_junk`` payload bytes prefixes the stream (the parser must skip
    it)."""
    out = bytearray()
    if id3_junk:
        size = id3_junk
        out += b"ID3\x04\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F])
        junk = hashlib.md5(f"{seed}:id3".encode()).digest() * (size // 16 + 1)
        out += junk[:size]
    for k in range(n_frames):
        kbps = kbps_cycle[k % len(kbps_cycle)]
        size = (144 * kbps * 1000) // sample_rate  # padding=0
        hdr = bytes([
            0xFF,
            0xE0 | (3 << 3) | (1 << 1) | 0x1,   # MPEG1, Layer III, no CRC
            (_BR_INDEX_V1[kbps] << 4) | (_SR_INDEX_V1[sample_rate] << 2),
            (3 << 6),                            # mono
        ])
        body = bytearray()
        j = 0
        while len(body) < size - 4:
            block = hashlib.md5(f"{seed}:{k}:{j}".encode()).digest()
            body += block
            j += 1
        frame = hdr + bytes(body[:size - 4])
        # avoid accidental sync words inside the junk payload (0xFF followed
        # by >=0xE0 would desynchronize a naive reader; the walker is
        # size-driven so it doesn't care, but keep streams unambiguous)
        frame = frame[:4] + frame[4:].replace(b"\xff", b"\x7f")
        out += frame
    return bytes(out)
