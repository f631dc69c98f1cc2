"""MP4 / ISO Base Media File Format (ISO/IEC 14496-12) container codec in
pure stdlib + numpy: box-tree walker, sample-table resolution
(stts/stsc/stsz/stco/co64/stss), per-track metadata, and real frame-sample
extraction — the container layer of the reference's video handling
(reference treats video as opaque binary + metadata; this makes the
frame-sample operator real at the container level). Decoding the CODED
frames (h264/h265/av1 bitstreams) still requires a codec and raises
NotImplementedError naming it.

A minimal valid writer (`encode_mp4`) exists so tests and the hash-checked
gate can build deterministic containers: ftyp + mdat + moov with a single
video track whose sample table uses MULTIPLE stts runs and stsc entries
(so the parser's run-length resolution is actually exercised).

Scale notes: parsing happens inside Arrow-batched mapInPandas on the
executors — payload bytes never visit the driver; a 100 TB corpus of
clips fans out embarrassingly parallel. Only the sampled frames are
emitted, so the explode is bounded by every_n/max_frames, not clip size.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts", b"mvex",
    b"udta",
}


def _walk(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the boxes in
    data[start:end]; handles 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < (body - pos) or pos + size > end:
            raise ValueError(f"mp4: box {btype!r} overruns its parent")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk(data, start, end):
        if t == btype:
            return b, e
    return None


@dataclass
class Mp4Track:
    track_id: int
    handler: str            # 'vide' / 'soun' / ...
    codec: str               # stsd entry fourcc, e.g. 'avc1', 'mp4v'
    timescale: int
    duration_ticks: int
    width: int
    height: int
    sample_sizes: np.ndarray      # uint32 per sample
    sample_offsets: np.ndarray    # absolute file offsets, uint64
    sample_ticks: np.ndarray      # decode timestamp in track ticks
    sync_samples: np.ndarray | None = None   # 0-based indices, or None=all

    @property
    def n_samples(self) -> int:
        return int(len(self.sample_sizes))

    @property
    def duration_s(self) -> float:
        return self.duration_ticks / self.timescale


@dataclass
class Mp4Info:
    movie_timescale: int
    movie_duration_ticks: int
    tracks: list[Mp4Track] = field(default_factory=list)

    @property
    def duration_s(self) -> float:
        return self.movie_duration_ticks / self.movie_timescale


def _parse_full(data: bytes, body: int):
    version = data[body]
    return version, body + 4


def _parse_stts(data: bytes, b: int) -> np.ndarray:
    _, p = _parse_full(data, b)
    n = struct.unpack_from(">I", data, p)[0]
    arr = np.frombuffer(data, dtype=">u4", count=2 * n, offset=p + 4)
    counts, deltas = arr[0::2].astype(np.int64), arr[1::2].astype(np.int64)
    return np.repeat(deltas, counts)  # per-sample delta


def _parse_stsz(data: bytes, b: int) -> np.ndarray:
    _, p = _parse_full(data, b)
    uniform, count = struct.unpack_from(">II", data, p)
    if uniform:
        return np.full(count, uniform, dtype=np.uint32)
    return np.frombuffer(data, dtype=">u4", count=count, offset=p + 8).astype(
        np.uint32)


def _parse_stco(data: bytes, b: int, wide: bool) -> np.ndarray:
    _, p = _parse_full(data, b)
    n = struct.unpack_from(">I", data, p)[0]
    dt = ">u8" if wide else ">u4"
    return np.frombuffer(data, dtype=dt, count=n, offset=p + 4).astype(np.uint64)


def _parse_stsc(data: bytes, b: int) -> np.ndarray:
    _, p = _parse_full(data, b)
    n = struct.unpack_from(">I", data, p)[0]
    arr = np.frombuffer(data, dtype=">u4", count=3 * n, offset=p + 4)
    return arr.reshape(n, 3).astype(np.int64)  # (first_chunk, per_chunk, desc)


def _parse_stss(data: bytes, b: int) -> np.ndarray:
    _, p = _parse_full(data, b)
    n = struct.unpack_from(">I", data, p)[0]
    return (np.frombuffer(data, dtype=">u4", count=n, offset=p + 4)
            .astype(np.int64) - 1)  # 1-based -> 0-based


def _resolve_offsets(sizes: np.ndarray, chunk_offsets: np.ndarray,
                     stsc: np.ndarray) -> np.ndarray:
    """Absolute file offset of every sample from the chunk map: stsc gives
    samples-per-chunk in (first_chunk, per_chunk) runs; within a chunk
    samples are contiguous."""
    n_chunks = len(chunk_offsets)
    if len(stsc) and int(stsc[0, 0]) != 1:
        raise ValueError(
            f"mp4: malformed stsc — first run starts at chunk "
            f"{int(stsc[0, 0])}, expected 1")
    per_chunk = np.zeros(n_chunks, dtype=np.int64)
    for i in range(len(stsc)):
        first = int(stsc[i, 0]) - 1
        last = int(stsc[i + 1, 0]) - 1 if i + 1 < len(stsc) else n_chunks
        per_chunk[first:last] = stsc[i, 1]
    if per_chunk.sum() != len(sizes):
        raise ValueError(
            f"mp4: stsc/stco chunk map covers {per_chunk.sum()} samples, "
            f"stsz declares {len(sizes)}")
    out = np.empty(len(sizes), dtype=np.uint64)
    s = 0
    csum = sizes.astype(np.uint64)
    for c in range(n_chunks):
        k = int(per_chunk[c])
        base = chunk_offsets[c]
        out[s] = base
        if k > 1:
            out[s + 1:s + k] = base + np.cumsum(csum[s:s + k - 1])
        s += k
    return out


def _parse_trak(data: bytes, b: int, e: int) -> Mp4Track | None:
    tkhd = _find(data, b, e, b"tkhd")
    track_id = width = height = 0
    if tkhd:
        version = data[tkhd[0]]
        base = tkhd[0] + 4
        track_id = struct.unpack_from(
            ">I", data, base + (16 if version else 8))[0]
        # width/height: 16.16 fixed point at the end of the box
        width = struct.unpack_from(">I", data, tkhd[1] - 8)[0] >> 16
        height = struct.unpack_from(">I", data, tkhd[1] - 4)[0] >> 16
    mdia = _find(data, b, e, b"mdia")
    if mdia is None:
        return None
    mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
    version = data[mdhd[0]]
    p = mdhd[0] + 4
    if version == 1:
        timescale, dur = struct.unpack_from(">IQ", data, p + 16)
    else:
        timescale, dur = struct.unpack_from(">II", data, p + 8)
    hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
    handler = data[hdlr[0] + 8:hdlr[0] + 12].decode("latin1") if hdlr else "?"
    minf = _find(data, mdia[0], mdia[1], b"minf")
    stbl = _find(data, minf[0], minf[1], b"stbl") if minf else None
    if stbl is None:
        return None
    sb, se = stbl
    stsd = _find(data, sb, se, b"stsd")
    codec = "?"
    if stsd:
        # first sample entry's fourcc
        codec = data[stsd[0] + 12:stsd[0] + 16].decode("latin1")
    stts = _find(data, sb, se, b"stts")
    stsz = _find(data, sb, se, b"stsz")
    stsc_box = _find(data, sb, se, b"stsc")
    stco = _find(data, sb, se, b"stco")
    co64 = _find(data, sb, se, b"co64")
    if stts is None or stsz is None or stsc_box is None or (
            stco is None and co64 is None):
        missing = [n for n, b_ in (("stts", stts), ("stsz", stsz),
                                   ("stsc", stsc_box),
                                   ("stco/co64", stco or co64)) if b_ is None]
        raise ValueError(f"mp4: stbl missing required boxes: {missing}")
    deltas = _parse_stts(data, stts[0])
    sizes = _parse_stsz(data, stsz[0])
    chunk_offsets = (_parse_stco(data, stco[0], False) if stco
                     else _parse_stco(data, co64[0], True))
    stsc = _parse_stsc(data, stsc_box[0])
    offsets = _resolve_offsets(sizes, chunk_offsets, stsc)
    stss = _find(data, sb, se, b"stss")
    sync = _parse_stss(data, stss[0]) if stss else None
    if len(deltas) != len(sizes):
        raise ValueError(
            f"mp4: stts covers {len(deltas)} samples, stsz {len(sizes)}")
    ticks = np.concatenate(([0], np.cumsum(deltas[:-1])))
    return Mp4Track(
        track_id=track_id, handler=handler, codec=codec, timescale=timescale,
        duration_ticks=int(dur), width=width, height=height,
        sample_sizes=sizes, sample_offsets=offsets, sample_ticks=ticks,
        sync_samples=sync,
    )


def parse_mp4(data: bytes) -> Mp4Info:
    """Parse the box tree and resolve every track's full sample table."""
    data = bytes(data)
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box (not an ISO BMFF file, or "
                         "streaming layout with moov after an unparsed mdat)")
    mvhd = _find(data, moov[0], moov[1], b"mvhd")
    version = data[mvhd[0]]
    p = mvhd[0] + 4
    if version == 1:
        m_ts, m_dur = struct.unpack_from(">IQ", data, p + 16)
    else:
        m_ts, m_dur = struct.unpack_from(">II", data, p + 8)
    info = Mp4Info(movie_timescale=m_ts, movie_duration_ticks=int(m_dur))
    for t, b, e in _walk(data, moov[0], moov[1]):
        if t == b"trak":
            tr = _parse_trak(data, b, e)
            if tr is not None:
                info.tracks.append(tr)
    return info


def extract_frames(data: bytes, every_n: int = 1, max_frames: int | None = None,
                   track_index: int | None = None):
    """[(sample_index, time_s, is_sync, payload_bytes)] for every
    every_n-th sample of the chosen track (default: first video track).
    The payload is the CODED sample exactly as stored (what a downstream
    h264/av1 decoder or a sample-level dedup would consume)."""
    data = bytes(data)
    info = parse_mp4(data)
    if track_index is None:
        vids = [i for i, t in enumerate(info.tracks) if t.handler == "vide"]
        track_index = vids[0] if vids else 0
    tr = info.tracks[track_index]
    sync = set(tr.sync_samples.tolist()) if tr.sync_samples is not None else None
    out = []
    for k in range(0, tr.n_samples, every_n):
        if max_frames is not None and len(out) >= max_frames:
            break
        off = int(tr.sample_offsets[k])
        size = int(tr.sample_sizes[k])
        if off + size > len(data):
            raise ValueError(f"mp4: sample {k} overruns the file")
        out.append((
            k,
            float(tr.sample_ticks[k]) / tr.timescale,
            (k in sync) if sync is not None else True,
            data[off:off + size],
        ))
    return out


def decode_frame(payload: bytes, codec: str = "avc1"):
    raise NotImplementedError(
        f"decoding {codec} coded frames requires a video codec "
        "(ffmpeg/libav bindings), not present in this runtime; container "
        "parsing, metadata, and coded-sample extraction are native")


# ---------------------------------------------------------------------------
# minimal writer (tests + deterministic gate containers)
# ---------------------------------------------------------------------------

def _box(btype: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, *parts: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags), *parts)


def encode_mp4(frames: list[bytes], timescale: int = 10,
               deltas: list[int] | None = None, width: int = 32,
               height: int = 24, codec: bytes = b"mp4v",
               sync_every: int = 3, chunk_split: int | None = None) -> bytes:
    """A minimal valid single-video-track MP4. ``deltas`` gives per-sample
    tick durations (default all 1 — stts still gets TWO runs when the
    first delta differs); ``chunk_split`` splits samples into two chunks
    (exercising multi-entry stsc); ``sync_every`` marks every n-th sample
    as a sync sample in stss."""
    n = len(frames)
    if deltas is None:
        deltas = [1] * n
    if chunk_split is None:
        chunk_split = max(1, n // 2)
    dur = sum(deltas)
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isomiso2")
    chunk1 = b"".join(frames[:chunk_split])
    chunk2 = b"".join(frames[chunk_split:])
    mdat = _box(b"mdat", chunk1 + chunk2)
    # chunk offsets are absolute: ftyp + mdat header precede
    c1_off = len(ftyp) + 8
    c2_off = c1_off + len(chunk1)

    # stts runs: run-length encode deltas
    runs = []
    for d in deltas:
        if runs and runs[-1][1] == d:
            runs[-1][0] += 1
        else:
            runs.append([1, d])
    stts = _full(b"stts", 0, 0, struct.pack(">I", len(runs)),
                 b"".join(struct.pack(">II", c, d) for c, d in runs))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n),
                 b"".join(struct.pack(">I", len(f)) for f in frames))
    stsc_entries = [(1, chunk_split, 1)]
    if n - chunk_split > 0:
        stsc_entries.append((2, n - chunk_split, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries)),
                 b"".join(struct.pack(">III", *e) for e in stsc_entries))
    offsets = [c1_off] + ([c2_off] if n - chunk_split > 0 else [])
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(offsets)),
                 b"".join(struct.pack(">I", o) for o in offsets))
    syncs = list(range(0, n, sync_every))
    stss = _full(b"stss", 0, 0, struct.pack(">I", len(syncs)),
                 b"".join(struct.pack(">I", s + 1) for s in syncs))
    sample_entry = _box(
        codec,
        b"\x00" * 6, struct.pack(">H", 1),          # data_reference_index
        b"\x00" * 16,
        struct.pack(">HH", width, height),
        struct.pack(">II", 0x00480000, 0x00480000),  # 72 dpi
        b"\x00" * 4, struct.pack(">H", 1),           # frame_count
        b"\x00" * 32,                                 # compressorname
        struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1), sample_entry)
    stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco, stss)
    url = _full(b"url ", 0, 1)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1), url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd, dinf, stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4, b"vide", b"\x00" * 12,
                 b"polars-st-spark\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, dur),
                 struct.pack(">HH", 0x55C4, 0))  # und language
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">III", 0, 0, 1),   # times, track_id
                 b"\x00" * 4, struct.pack(">I", dur), b"\x00" * 8,
                 struct.pack(">HHHH", 0, 0, 0, 0),
                 # identity matrix (16.16 / 2.30 fixed point)
                 struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000),
                 struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd, mdia)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, dur),
                 struct.pack(">I", 0x00010000), struct.pack(">H", 0x0100),
                 b"\x00" * 10,
                 struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000),
                 b"\x00" * 24, struct.pack(">I", 2))  # next_track_id
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov
