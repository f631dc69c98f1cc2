"""Geohash encode/decode — pure JVM-side bit arithmetic (no UDF), the
PostGIS ``ST_GeoHash`` / ``ST_PointFromGeoHash`` surface.

A geohash interleaves the bisection bits of (lon, lat) — MSB first,
longitude leading — and renders every 5 bits as one character of the
base-32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz`` (public algorithm,
G. Niemeyer 2008; PostGIS docs). Encoding here is quantize + magic-mask
bit dilation + per-character table lookup, all built-in Spark expressions
inside whole-stage codegen — the same design as functions/zorder.py, and
the natural prefix-join key for geo-bucketing at 100 TB (equal prefixes ⇒
nearby cells).

Decoding returns the CELL CENTER (PostGIS ``ST_PointFromGeoHash``
convention): ``(q + 0.5) · span / 2^bits + origin`` — exactly-rounded
IEEE ops, so a SQL oracle reproduces the doubles bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["geohash_decode_xy", "geohash_xy", "st_geohash", "st_point_from_geohash"]

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# Bit interleave/extract as OR-chains of single-bit terms, NOT the magic-
# mask dilation zorder.py uses: dilation steps reference their input twice
# (``v | (v << s)``), doubling the Column expression TREE per step — 32×
# for a 5-step spread — which explodes to millions of analysis nodes when
# a decode feeds an encode (found by the round-trip test OOMing the
# driver). Single-bit terms reference the input once each: tree growth is
# linear in the bit count, and codegen's common-subexpression elimination
# still evaluates the input once at runtime.


def _gather_bits(v: Column, positions: list[int]) -> Column:
    """Value whose bit i is ``v``'s bit ``positions[i]``."""
    out = None
    for i, pos in enumerate(positions):
        bit = F.shiftrightunsigned(v, pos).bitwiseAND(F.lit(1))
        term = F.shiftleft(bit, i) if i else bit
        out = term if out is None else out.bitwiseOR(term)
    return out


def _scatter_bits(v: Column, positions: list[int]) -> Column:
    """Value whose bit ``positions[i]`` is ``v``'s bit i."""
    out = None
    for i, pos in enumerate(positions):
        bit = F.shiftrightunsigned(v, i).bitwiseAND(F.lit(1)) if i else v.bitwiseAND(F.lit(1))
        term = F.shiftleft(bit, pos) if pos else bit
        out = term if out is None else out.bitwiseOR(term)
    return out


def _lon_lat_positions(lon_bits: int, lat_bits: int) -> tuple[list[int], list[int]]:
    """Bit positions (from the LSB of the 5p-bit value) of each lon/lat
    bit, LSB-first. Geohash order: MSB is longitude's top bit, then strict
    alternation — so from the LSB, lon occupies the odd positions when the
    total is even and the even positions when odd."""
    total = lon_bits + lat_bits
    lon_lsb = 0 if total % 2 else 1
    lon = [lon_lsb + 2 * i for i in range(lon_bits)]
    lat = [(1 - lon_lsb) + 2 * i for i in range(lat_bits)]
    return lon, lat


def _bit_split(precision: int) -> tuple[int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2  # longitude leads (takes the extra bit)
    return lon_bits, total - lon_bits


def _quant(v: Column, lo: float, span: float, bits: int) -> Column:
    n = 1 << bits
    q = F.floor((v - F.lit(lo)) / F.lit(span) * F.lit(float(n)))
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), q)).cast("long")


def geohash_xy(x, y, precision: int = 9) -> Column:
    """Geohash string of (lon ``x``, lat ``y``) at ``precision`` characters
    (1..12). Codegen-only: quantize, dilate, OR-interleave, then one
    substring table lookup per character."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    lon_bits, lat_bits = _bit_split(precision)
    qlon = _quant(x.cast("double"), -180.0, 360.0, lon_bits)
    qlat = _quant(y.cast("double"), -90.0, 180.0, lat_bits)
    lon_pos, lat_pos = _lon_lat_positions(lon_bits, lat_bits)
    v = _scatter_bits(qlon, lon_pos).bitwiseOR(_scatter_bits(qlat, lat_pos))
    chars = [
        F.substring(
            F.lit(_B32),
            (
                F.shiftrightunsigned(v, 5 * (precision - 1 - i))
                .bitwiseAND(F.lit(31))
                .cast("int")
                + 1
            ),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def st_geohash(geom, precision: int = 9) -> Column:
    """Geohash of a geometry's bbox center (points: the point itself) —
    PostGIS ``ST_GeoHash``. Geometries must be in lon/lat (SRID 4326
    semantics; the function does not reproject)."""
    from polars_st_spark.functions.factory import geom_arg
    from polars_st_spark.functions.scalar import st_bounds

    b = st_bounds(geom_arg(geom))
    return geohash_xy((b[0] + b[2]) / 2, (b[1] + b[3]) / 2, precision)


def geohash_decode_xy(gh, precision: int = 9) -> tuple[Column, Column]:
    """(lon, lat) center of a ``precision``-character geohash — inverse
    quantization at the cell midpoint. The input must be exactly
    ``precision`` characters (the standard fixed-precision pipeline case);
    shorter strings decode as if zero-padded."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    gh = F.col(gh) if isinstance(gh, str) else gh
    v = F.lit(0).cast("long")
    for i in range(precision):
        v = F.shiftleft(v, 5).bitwiseOR(_b32_digit(gh, i + 1))
    lon_bits, lat_bits = _bit_split(precision)
    lon_pos, lat_pos = _lon_lat_positions(lon_bits, lat_bits)
    qlon = _gather_bits(v, lon_pos)
    qlat = _gather_bits(v, lat_pos)
    lon = (qlon.cast("double") + 0.5) * F.lit(360.0 / (1 << lon_bits)) + F.lit(-180.0)
    lat = (qlat.cast("double") + 0.5) * F.lit(180.0 / (1 << lat_bits)) + F.lit(-90.0)
    return lon, lat


def _b32_digit(gh: Column, pos: int) -> Column:
    """0-based alphabet index of the character at 1-based ``pos`` —
    ``instr(alphabet, char) - 1``; characters outside the alphabet (and
    positions past the end) decode as digit 0."""
    ch = F.substring(gh, pos, 1)
    idx = F.call_function("instr", F.lit(_B32), ch)
    return F.greatest(idx, F.lit(1)).cast("long") - 1


def st_point_from_geohash(gh, precision: int = 9) -> Column:
    """Center point geometry (SRID 4326) of a geohash cell — PostGIS
    ``ST_PointFromGeoHash``."""
    from polars_st_spark.functions.construct import st_point
    from polars_st_spark.functions.transform import st_set_srid

    lon, lat = geohash_decode_xy(gh, precision)
    return st_set_srid(st_point(lon, lat), 4326)
