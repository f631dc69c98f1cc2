"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the Spark-idiomatic layout for multimodal training data at scale (payload
stays columnar in Parquet, metadata prunes/filters without touching bytes).

``decode="real"`` decodes the dependency-free formats end to end — BMP
images (BITMAPINFOHEADER 24/32-bpp, hand-parsed per the public Windows BMP
spec: bottom-up rows, 4-byte padding, BGR order), 8-bit PNG (r6: pure
stdlib — chunk walk + zlib inflate + the five RFC 2083 scanline filters;
gray/RGB/palette/alpha color types, CRC-verified), baseline sequential
AND progressive JPEG (r7/r8: pure stdlib+numpy ITU-T T.81 — Huffman +
dequant + float IDCT + 4:2:0/4:2:2 upsampling + JFIF YCbCr; progressive
spectral selection + successive approximation, ``operators/jpeg.py``,
which also provides baseline and progressive encoders) and PCM WAV audio
(stdlib ``wave``) — with numpy nearest-neighbor resizing and BMP/PNG/JPEG
re-encoders, so the image/audio pipeline runs REAL bytes with zero
external codecs. Formats still needing a real codec (mp3/mp4) raise
NotImplementedError naming the dependency (ffmpeg — absent here).
``decode="fake"`` remains: a deterministic pseudo-decode seeded from the
payload hash, exercising the identical Spark plumbing (schema, Arrow
batching, mapInPandas flow) for any payload bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "sniff_media_metadata",
    "image_features",
    "image_resize",
    "audio_features",
    "frame_sample",
    "video_metadata",
    "mp3_metadata",
]

# canonical media column pair: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),   # image/audio/video
        StructField("format", StringType()),       # png/jpeg/wav/mp4/...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("size_bytes", LongType()),
    ]
)


def _sniff_one(data: bytes) -> dict:
    """(media_type, format, width, height, n_frames, sample_rate) REALLY
    parsed from the payload's own headers — magic-byte dispatch over every
    natively-supported container/codec."""
    out = {"media_type": None, "format": None, "width": None, "height": None,
           "n_frames": None, "sample_rate": None}
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack_from("<ii", data, 18)
        out.update(media_type="image", format="bmp", width=w, height=abs(h))
    elif data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack_from(">II", data, 16)
        out.update(media_type="image", format="png", width=w, height=h)
    elif data[:2] == b"\xff\xd8":
        pos = 2
        fmt = "jpeg"
        while pos + 9 < len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h, w = struct.unpack_from(">HH", data, pos + 5)
                out.update(media_type="image",
                           format="pjpeg" if marker == 0xC2 else "jpeg",
                           width=w, height=h)
                break
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            pos += 2 + struct.unpack_from(">H", data, pos + 2)[0]
        out["media_type"] = out["media_type"] or "image"
        out["format"] = out["format"] or fmt
    elif data[:4] == b"GIF8" and len(data) >= 10:
        w, h = struct.unpack_from("<HH", data, 6)
        out.update(media_type="image", format="gif", width=w, height=h)
    elif data[:2] in (b"II", b"MM") and len(data) >= 8 and struct.unpack_from(
            "<H" if data[:2] == b"II" else ">H", data, 2)[0] == 42:
        # Dimensions are plain IFD tags 256/257 — no need to decode the
        # raster, and this works for TIFFs outside the decode envelope
        # (LZW, tiled, >8-bit).
        from polars_st_spark.operators.tiff import _read_ifd

        bo = "<" if data[:2] == b"II" else ">"
        ifd_off = struct.unpack_from(bo + "I", data, 4)[0]
        tags = _read_ifd(data, ifd_off, bo)
        w = tags.get(256, [None])[0]
        h = tags.get(257, [None])[0]
        out.update(media_type="image", format="tiff", width=w, height=h)
    elif data[:4] == b"fLaC":
        from polars_st_spark.operators.flac import parse_flac

        fi = parse_flac(data)
        out.update(media_type="audio", format="flac",
                   sample_rate=fi["sample_rate"],
                   n_frames=fi["total_samples"])
    elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(data), "rb") as wf:
            out.update(media_type="audio", format="wav",
                       sample_rate=wf.getframerate(),
                       n_frames=wf.getnframes())
    elif data[4:8] == b"ftyp":
        from polars_st_spark.operators.mp4 import parse_mp4

        info = parse_mp4(data)
        vids = [t for t in info.tracks if t.handler == "vide"]
        t = vids[0] if vids else info.tracks[0]
        out.update(media_type="video" if vids else "audio", format="mp4",
                   width=t.width or None, height=t.height or None,
                   n_frames=t.n_samples, sample_rate=t.timescale)
    elif data[:3] == b"ID3" or (len(data) >= 2 and data[0] == 0xFF
                                and (data[1] & 0xE0) == 0xE0):
        from polars_st_spark.operators.mp3 import parse_mp3

        info = parse_mp3(data)
        out.update(media_type="audio", format="mp3",
                   n_frames=info["n_frames"],
                   sample_rate=info["sample_rate"])
    return out


def sniff_media_metadata(df: DataFrame, payload_col: str) -> DataFrame:
    """REAL metadata sniffing for a binary payload column: magic-byte
    dispatch to the native parsers (BMP/PNG/JPEG headers, stdlib WAV, ISO
    BMFF sample tables, MP3 frame walk) filling MEDIA_SCHEMA with parsed
    values; unknown formats yield NULL fields (never an error — a 100 TB
    crawl always contains garbage rows). Arrow-batched mapInPandas,
    executor-side only."""
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(payload_col + "_meta", MEDIA_SCHEMA)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload in pdf[payload_col]:
                if payload is None:
                    metas.append(None)
                    continue
                b = bytes(payload)
                try:
                    m = _sniff_one(b)
                except Exception:
                    m = {"media_type": None, "format": None, "width": None,
                         "height": None, "n_frames": None,
                         "sample_rate": None}
                metas.append({**m, "size_bytes": len(b)})
            pdf = pdf.copy()
            pdf[payload_col + "_meta"] = metas
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def attach_media_metadata(df: DataFrame, payload_col: str, media_type: str = "image",
                          fmt: str = "png") -> DataFrame:
    """Derive the metadata struct for a binary payload column (size from the
    bytes; format/type declared). Pure Spark SQL. For parsed-from-bytes
    metadata use :func:`sniff_media_metadata`."""
    return df.withColumn(
        payload_col + "_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.length(F.col(payload_col)).cast("long").alias("size_bytes"),
        ),
    )


import struct


def _decode_bmp(data: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 from an uncompressed 24/32-bpp BMP (public
    Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h) = struct.unpack_from("<Iii", data, 14)
    (planes, bpp) = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression}); "
                         "only uncompressed 24/32-bpp is codec-free")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) // 4 * 4
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_off)
    img = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if flip:
        img = img[::-1]
    return img[:, :, [2, 1, 0]].copy()  # BGR(A) -> RGB, alpha dropped


def _encode_bmp(img: np.ndarray) -> bytes:
    """Uncompressed 24-bpp BMP bytes from an (h, w, 3) RGB uint8 array."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # RGB->BGR, bottom-up
    pix = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (public PNG spec / RFC 2083 §4.1.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (RFC 2083 §6.6) — vectorized over one pixel's bytes."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(np.uint8)


def _decode_png(data: bytes) -> np.ndarray:
    """(h, w, channels) uint8 from an 8-bit non-interlaced PNG — pure
    stdlib: chunk walk + zlib inflate + the five scanline filters
    (None/Sub/Up/Average/Paeth, RFC 2083 §6). Supports color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA). CRCs are
    verified. 16-bit and interlaced files raise naming the limitation.

    Size envelope: None/Sub/Up filtered rows unfilter vectorized; Average
    and Paeth rows carry a sequential per-pixel data dependency and run an
    interpreter loop — fine for thumbnail-scale gates, O(h*w) Python ops
    for megapixel inputs (swap in an optimized codec for those)."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + length > len(data):
            raise ValueError(
                f"PNG: truncated chunk at offset {pos} "
                f"(declared {length} bytes, {len(data) - pos - 12} available)"
            )
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG: missing IHDR chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"PNG: unknown compression/filter method ({comp}/{filt})")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlacing not supported (pass 0)")
    if depth != 8:
        raise ValueError(f"PNG: only 8-bit depth supported, got {depth}")
    nch = _PNG_CHANNELS.get(color)
    if nch is None:
        raise ValueError(f"PNG: unknown color type {color}")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG: inflated size {len(raw)} != expected {h * (stride + 1)}"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(nch, dtype=np.uint8)
    for r in range(h):
        ftype = int(lines[r, 0])
        row = lines[r, 1:].copy()
        prev = out[r - 1] if r else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[r] = row
        elif ftype == 1:  # Sub: cumulative sum per byte lane (mod 256)
            lanes = row.reshape(w, nch).astype(np.int64)
            out[r] = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            out[r] = row + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            cur = out[r]
            for px in range(w):
                s = slice(px * nch, (px + 1) * nch)
                a = cur[(px - 1) * nch : px * nch] if px else zero
                avg = (a.astype(np.int32) + prev[s].astype(np.int32)) >> 1
                cur[s] = row[s] + avg.astype(np.uint8)
        elif ftype == 4:  # Paeth
            cur = out[r]
            for px in range(w):
                s = slice(px * nch, (px + 1) * nch)
                a = cur[(px - 1) * nch : px * nch] if px else zero
                c = prev[(px - 1) * nch : px * nch] if px else zero
                cur[s] = row[s] + _paeth(a, prev[s], c)
        else:
            raise ValueError(f"PNG: unknown filter type {ftype} in row {r}")
    img = out.reshape(h, w, nch)
    if color == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE chunk")
        img = plte[img[:, :, 0]]
    return img


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _encode_png(img: np.ndarray, filters: str = "none") -> bytes:
    """8-bit non-interlaced PNG bytes from (h, w) gray or (h, w, {1,2,3,4})
    arrays. ``filters="none"`` writes filter-0 rows; ``filters="cycle"``
    applies filter type ``r % 5`` to row r (computing the filtered residual
    per RFC 2083 §6) so round-trip tests exercise every decode branch."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(nch)
    if color is None:
        raise ValueError(f"cannot encode {nch}-channel image as PNG")
    flat = img.astype(np.uint8).reshape(h, w * nch)
    zero_px = np.zeros(nch, dtype=np.uint8)
    lines = bytearray()
    for r in range(h):
        ftype = (r % 5) if filters == "cycle" else 0
        row = flat[r]
        prev = flat[r - 1] if r else np.zeros(w * nch, dtype=np.uint8)
        if ftype == 0:
            resid = row
        elif ftype == 1:
            a = np.concatenate([zero_px, row[:-nch]])
            resid = row - a
        elif ftype == 2:
            resid = row - prev
        elif ftype == 3:
            a = np.concatenate([zero_px, row[:-nch]]).astype(np.int32)
            resid = (row - ((a + prev.astype(np.int32)) >> 1).astype(np.uint8))
        else:  # 4
            a = np.concatenate([zero_px, row[:-nch]])
            c = np.concatenate([zero_px, prev[:-nch]])
            resid = row - _paeth(a, prev, c)
        lines.append(ftype)
        lines.extend(resid.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resample (pixel-center mapping) — pure numpy."""
    sh, sw = img.shape[:2]
    yi = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(np.int64), sh - 1)
    xi = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(np.int64), sw - 1)
    return img[yi[:, None], xi[None, :]]


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(mono float64 samples in [-1, 1], sample_rate) from a PCM WAV (stdlib
    ``wave``) or a FLAC stream (operators/flac.py native decode — Rice +
    fixed/LPC predictors, CRC + MD5 verified)."""
    import io
    import wave

    if data[:4] == b"fLaC":
        from polars_st_spark.operators.flac import decode_flac, parse_flac

        bps = parse_flac(data)["bits_per_sample"]
        samples, rate = decode_flac(data)
        pcm = samples.mean(axis=1) / float(1 << (bps - 1))
        return pcm, rate
    with wave.open(io.BytesIO(data), "rb") as wf:
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width} (8/16-bit PCM only)")
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm, rate


def _to_rgb(img: np.ndarray) -> np.ndarray:
    """(h, w, any) → (h, w, 3) RGB: gray replicated, alpha dropped."""
    nch = img.shape[2]
    if nch >= 3:
        return img[:, :, :3]
    return np.repeat(img[:, :, :1], 3, axis=2)


def _real_decode_image(payload: bytes, h: int, w: int) -> np.ndarray:
    if payload[:2] == b"BM":
        return _resize_nearest(_decode_bmp(payload), h, w)
    if payload[:8] == _PNG_SIG:
        return _resize_nearest(_to_rgb(_decode_png(payload)), h, w)
    if payload[:2] == b"\xff\xd8":  # JPEG SOI (r7 baseline / r8 progressive)
        from polars_st_spark.operators.jpeg import decode_jpeg

        img = decode_jpeg(payload)
        if img.ndim == 2:
            img = img[:, :, None]
        return _resize_nearest(_to_rgb(img), h, w)
    if payload[:4] == b"GIF8":  # r8: native LZW GIF decode
        from polars_st_spark.operators.gif import decode_gif

        return _resize_nearest(decode_gif(payload), h, w)
    if payload[:2] in (b"II", b"MM"):  # r8: native baseline TIFF decode
        from polars_st_spark.operators.tiff import decode_tiff

        return _resize_nearest(_to_rgb(decode_tiff(payload)), h, w)
    raise NotImplementedError(
        "real decode of non-BMP/PNG/JPEG/GIF/TIFF images requires "
        "Pillow/opencv, not present in this runtime; BMP, 8-bit PNG, "
        "baseline/progressive JPEG, GIF, and baseline TIFF decode natively"
    )


def _fake_decode(payload: bytes, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic pseudo-decode: pixels from the md5 stream of the payload.

    The stream chains over ASCII hex (seed = md5(payload).hexdigest();
    block_k = md5(f"{seed}:{k}")) rather than raw digest bytes, so an ANSI
    SQL oracle whose md5() only accepts VARCHAR (DuckDB) can replay it
    bit-for-bit — that is what graduates the multimodal_features /
    multimodal_audio gates from rows-only to hash-checked (r8)."""
    need = h * w * 3
    out = bytearray()
    counter = 0
    seed = hashlib.md5(payload).hexdigest()
    while len(out) < need:
        out.extend(hashlib.md5(f"{seed}:{counter}".encode()).digest())
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(h, w, 3)


def image_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    decode: str = "fake",
    resize: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Decode → resize → mean-channel feature vector, via mapInPandas.

    Output: (id, height, width, channels, features array<float>). Arrow-batched;
    one Python pass per partition, no driver collection.
    """
    if decode not in ("real", "fake"):
        raise ValueError(f"decode must be 'real' or 'fake', got {decode!r}")
    h, w = resize
    schema = StructType(
        [
            df.schema[id_col],
            StructField("height", IntegerType()),
            StructField("width", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                raw = bytes(payload)
                img = (_real_decode_image(raw, h, w) if decode == "real"
                       else _fake_decode(raw, h, w))
                ids.append(i)
                feats.append(img[:, :, :3].mean(axis=(0, 1)).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "height": h,
                    "width": w,
                    "channels": 3,
                    "features": feats,
                }
            )

    # only (id, payload) cross the Python boundary: mapInPandas is opaque
    # to column pruning, so an un-projected df would ship (and scan) every
    # caller column (guide §4.1)
    return df.select(id_col, payload_col).mapInPandas(gen, schema=schema)


def image_resize(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    size: tuple[int, int] = (4, 4),
    decode: str = "fake",
) -> DataFrame:
    """Decode → resize → re-encode plumbing: output keeps the binary payload
    column shape (payload in, payload out) so resize stages compose in a
    pipeline. Fake decode produces the deterministic pseudo-image; the
    "re-encode" is its raw RGB bytes."""
    if decode not in ("real", "fake"):
        raise ValueError(f"decode must be 'real' or 'fake', got {decode!r}")
    h, w = size
    schema = StructType(
        [
            df.schema[id_col],
            StructField("payload", BinaryType()),
            StructField("height", IntegerType()),
            StructField("width", IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                ids.append(i)
                raw = bytes(payload)
                if decode == "real":
                    # decode -> nearest resize -> BMP re-encode: payload out
                    # is a real image again, so resize stages compose
                    payloads.append(_encode_bmp(_real_decode_image(raw, h, w)[:, :, :3]))
                else:
                    payloads.append(_fake_decode(raw, h, w).tobytes())
            yield pd.DataFrame({id_col: ids, "payload": payloads, "height": h, "width": w})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=schema)


def audio_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    decode: str = "fake",
    sample_rate: int = 16000,
    n_samples: int = 4096,
) -> DataFrame:
    """Decode → PCM feature extraction via mapInPandas: duration, RMS level,
    zero-crossing rate, and low/high band energy split. Fake decode derives a
    deterministic int16 PCM stream from the payload's md5 stream; real decode
    needs an audio codec (soundfile/ffmpeg) and raises until one exists."""
    if decode not in ("real", "fake"):
        raise ValueError(f"decode must be 'real' or 'fake', got {decode!r}")
    schema = StructType(
        [
            df.schema[id_col],
            StructField("duration_s", FloatType()),
            StructField("rms", FloatType()),
            StructField("zero_crossing_rate", FloatType()),
            StructField("low_band_energy", FloatType()),
            StructField("high_band_energy", FloatType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("id", "dur", "rms", "zcr", "lo", "hi")}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                if decode == "real":
                    pcm, rate = _decode_wav(bytes(payload))
                else:
                    raw = _fake_decode(bytes(payload), 1, (n_samples * 2 + 2) // 3).reshape(-1)
                    pcm = raw[: n_samples * 2].view(np.uint8).astype(np.uint16)
                    pcm = (pcm[0::2].astype(np.int32) | (pcm[1::2].astype(np.int32) << 8))
                    pcm = (pcm - 32768).astype(np.float64) / 32768.0
                    rate = sample_rate
                rows["id"].append(i)
                rows["dur"].append(len(pcm) / rate)
                rows["rms"].append(float(np.sqrt(np.mean(pcm * pcm))))
                rows["zcr"].append(float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))))
                spec = np.abs(np.fft.rfft(pcm)) ** 2
                half = len(spec) // 2
                total = spec.sum() or 1.0
                rows["lo"].append(float(spec[:half].sum() / total))
                rows["hi"].append(float(spec[half:].sum() / total))
            yield pd.DataFrame(
                {
                    id_col: rows["id"],
                    "duration_s": rows["dur"],
                    "rms": rows["rms"],
                    "zero_crossing_rate": rows["zcr"],
                    "low_band_energy": rows["lo"],
                    "high_band_energy": rows["hi"],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema=schema)


def frame_sample(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_n: int = 10,
    n_frames: int = 100,
    decode: str = "fake",
) -> DataFrame:
    """Sample every-n-th frame of a video payload: one output row per
    sampled frame. decode="mp4" parses the REAL ISO BMFF container
    (operators/mp4.py: stts/stsc/stsz/stco sample-table resolution) and
    emits each sampled CODED sample's actual bytes plus its timestamp and
    sync flag; decode="fake" keeps the deterministic pseudo-payload path;
    decode="real" (pixel decode of the coded frames) raises naming the
    missing codec. Explode stays bounded by every_n/n_frames, payloads
    never visit the driver."""
    if decode == "real":
        raise NotImplementedError(
            "decoding coded video frames to pixels requires ffmpeg/libav "
            "bindings; use decode='mp4' for container-level frame "
            "extraction (native)")
    fields = [
        df.schema[id_col],
        StructField("frame_index", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
    if decode == "mp4":
        from pyspark.sql.types import BooleanType, DoubleType

        fields += [StructField("time_s", DoubleType()),
                   StructField("is_sync", BooleanType())]
    schema = StructType(fields)
    if decode == "mp4":
        from polars_st_spark.operators.mp4 import extract_frames

        def gen_mp4(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, idxs, payloads, times, syncs = [], [], [], [], []
                for i, payload in zip(pdf[id_col], pdf[payload_col]):
                    if payload is None:
                        continue
                    for k, ts, sy, fb in extract_frames(
                            bytes(payload), every_n=every_n,
                            max_frames=n_frames):
                        ids.append(i)
                        idxs.append(k)
                        payloads.append(fb)
                        times.append(ts)
                        syncs.append(sy)
                yield pd.DataFrame({
                    id_col: ids, "frame_index": idxs,
                    "frame_payload": payloads, "time_s": times,
                    "is_sync": syncs,
                })

        return df.select(id_col, payload_col).mapInPandas(gen_mp4, schema=schema)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for fi in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    payloads.append(
                        hashlib.md5(bytes(payload) + fi.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame_payload": payloads})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=schema)


def mp3_metadata(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """REAL per-stream MP3 metadata (operators/mp3.py frame-header walk:
    ID3v2 skip, bitrate/sample-rate tables, per-frame size arithmetic) —
    frame count, duration, average bitrate, VBR flag — parsed executor-side
    in Arrow batches; Layer III audio DECODE still raises naming the
    codec."""
    from pyspark.sql.types import BooleanType, DoubleType, LongType

    from polars_st_spark.operators.mp3 import parse_mp3

    schema = StructType([
        df.schema[id_col],
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("avg_bitrate_kbps", DoubleType()),
        StructField("total_audio_bytes", LongType()),
        StructField("vbr", BooleanType()),
    ])
    keys = ("n_frames", "duration_s", "sample_rate", "channels",
            "avg_bitrate_kbps", "total_audio_bytes", "vbr")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in keys}
            ids = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                info = parse_mp3(bytes(payload))
                ids.append(i)
                for k in keys:
                    rows[k].append(info[k])
            yield pd.DataFrame({id_col: ids, **rows})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=schema)


def video_metadata(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """REAL per-clip container metadata from ISO BMFF payloads
    (operators/mp4.py): codec fourcc, dimensions, timescale, duration,
    sample/sync counts — the typed-metadata side of the reference's
    opaque-binary video model, parsed executor-side in Arrow batches (no
    driver hop, no codec dependency)."""
    from pyspark.sql.types import DoubleType, LongType, StringType

    from polars_st_spark.operators.mp4 import parse_mp4

    schema = StructType([
        df.schema[id_col],
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("timescale", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("n_samples", LongType()),
        StructField("n_sync", LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("codec", "width", "height", "timescale",
                                    "duration_s", "n_samples", "n_sync")}
            ids = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                info = parse_mp4(bytes(payload))
                vids = [t for t in info.tracks if t.handler == "vide"]
                t = vids[0] if vids else info.tracks[0]
                ids.append(i)
                rows["codec"].append(t.codec)
                rows["width"].append(t.width)
                rows["height"].append(t.height)
                rows["timescale"].append(t.timescale)
                rows["duration_s"].append(t.duration_s)
                rows["n_samples"].append(t.n_samples)
                rows["n_sync"].append(
                    len(t.sync_samples) if t.sync_samples is not None
                    else t.n_samples)
            yield pd.DataFrame({id_col: ids, **rows})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=schema)
