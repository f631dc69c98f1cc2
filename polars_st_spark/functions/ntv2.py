"""NTv2 grid-shift datum transformations (``+nadgrids=``).

Closes the last ``st_to_srid`` envelope from the round-4 verdict: datum
pairs that need a distortion GRID rather than a 7-parameter Helmert
(classic NAD27→NAD83 high-accuracy zones, OSTN-class national grids).
The reference gets these through proj4rs' grid loader
(reference: functions.rs:1868-1939); here the public NTv2 binary format
(``.gsb`` — Natural Resources Canada, "National Transformation version 2
Developer's Guide"; same layout PROJ reads) is parsed directly and the
bilinear-interpolated shift is applied vectorized in numpy.

Usage::

    from polars_st_spark.functions.ntv2 import register_nadgrid
    from polars_st_spark.functions.proj4 import register_proj4

    register_nadgrid("ntv2_0.gsb", open("ntv2_0.gsb", "rb").read())
    register_proj4(900027, "+proj=longlat +ellps=clrk66 "
                   "+nadgrids=ntv2_0.gsb")
    df.select(st.st_to_srid(st.st_set_srid("geom", 900027), 4326))

Conventions (all public, from the NTv2 spec and PROJ's ntv2 reader):

- Grid node values are arc-seconds; LONGITUDE IS POSITIVE WEST (NAD
  heritage).  Applying the grid source→target:
  ``lat_t = lat_s + Δφ/3600``; in positive-EAST degrees
  ``lon_t = lon_s - Δλ/3600``.
- Nodes are row-major from S_LAT northward; within a row from E_LONG
  WESTWARD (increasing positive-west longitude).
- The inverse (target→source) has no closed form; PROJ fixed-point
  iterates the forward shift — 4 iterations converge far below float32
  grid resolution and that is what :func:`_inverse_shift` does.
- Points outside every subgrid pass through UNCHANGED (PROJ's lenient
  ``+nadgrids=@grid`` behaviour); strictness is the caller's choice via
  :func:`grid_coverage_mask`.

Registered grids live in a driver-side registry and ship to executors
inside the reprojection UDF closure (same lifecycle as
``register_proj4`` — register before building the query).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

__all__ = [
    "NTv2SubGrid",
    "make_ntv2_bytes",
    "parse_ntv2",
    "register_nadgrid",
    "unregister_nadgrid",
]

# name -> list[NTv2SubGrid]; populated by register_nadgrid
_GRIDS: dict[str, list["NTv2SubGrid"]] = {}


@dataclass
class NTv2SubGrid:
    """One subgrid: bounds in arc-seconds (lon positive WEST), node
    increments, and (nrows, ncols) float64 shift arrays in arc-seconds."""

    name: str
    parent: str
    s_lat: float
    n_lat: float
    e_long: float  # positive-west seconds — numerically the SMALLER bound
    w_long: float
    lat_inc: float
    long_inc: float
    lat_shift: np.ndarray  # (nrows, ncols) arc-seconds
    lon_shift: np.ndarray  # (nrows, ncols) arc-seconds, positive west

    @property
    def nrows(self) -> int:
        return self.lat_shift.shape[0]

    @property
    def ncols(self) -> int:
        return self.lat_shift.shape[1]

    def contains(self, lon_deg: np.ndarray, lat_deg: np.ndarray) -> np.ndarray:
        """Boolean mask of points inside this subgrid (edges inclusive).
        ``lon_deg`` is positive-east degrees."""
        glon = -np.asarray(lon_deg, dtype=np.float64) * 3600.0
        glat = np.asarray(lat_deg, dtype=np.float64) * 3600.0
        return (
            (glat >= self.s_lat)
            & (glat <= self.n_lat)
            & (glon >= self.e_long)
            & (glon <= self.w_long)
        )

    def interpolate(
        self, lon_deg: np.ndarray, lat_deg: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Bilinear (Δφ_sec, Δλ_sec positive-west) at positive-east-degree
        query points. Caller guarantees points are inside bounds."""
        glon = -np.asarray(lon_deg, dtype=np.float64) * 3600.0
        glat = np.asarray(lat_deg, dtype=np.float64) * 3600.0
        col = (glon - self.e_long) / self.long_inc
        row = (glat - self.s_lat) / self.lat_inc
        c0 = np.clip(np.floor(col).astype(np.int64), 0, self.ncols - 2)
        r0 = np.clip(np.floor(row).astype(np.int64), 0, self.nrows - 2)
        fx = col - c0
        fy = row - r0
        la, lo = self.lat_shift, self.lon_shift
        w00 = (1 - fx) * (1 - fy)
        w10 = fx * (1 - fy)
        w01 = (1 - fx) * fy
        w11 = fx * fy
        dphi = (
            w00 * la[r0, c0]
            + w10 * la[r0, c0 + 1]
            + w01 * la[r0 + 1, c0]
            + w11 * la[r0 + 1, c0 + 1]
        )
        dlam = (
            w00 * lo[r0, c0]
            + w10 * lo[r0, c0 + 1]
            + w01 * lo[r0 + 1, c0]
            + w11 * lo[r0 + 1, c0 + 1]
        )
        return dphi, dlam


def _rec(name: bytes, payload: bytes) -> bytes:
    assert len(name) == 8 and len(payload) == 8
    return name + payload


def _srec(name: bytes, text: str) -> bytes:
    return _rec(name, text.encode("ascii").ljust(8)[:8])


def _irec(name: bytes, val: int) -> bytes:
    return _rec(name, struct.pack("<i", val) + b"\x00\x00\x00\x00")


def _drec(name: bytes, val: float) -> bytes:
    return _rec(name, struct.pack("<d", val))


def make_ntv2_bytes(subgrids: list[NTv2SubGrid]) -> bytes:
    """Serialize subgrids into spec-conformant little-endian ``.gsb``
    bytes (round-trips through :func:`parse_ntv2`; useful for tests and
    for shipping small custom grids without files)."""
    out = [
        _irec(b"NUM_OREC", 11),
        _irec(b"NUM_SREC", 11),
        _irec(b"NUM_FILE", len(subgrids)),
        _srec(b"GS_TYPE ", "SECONDS"),
        _srec(b"VERSION ", "NTv2.0"),
        _srec(b"SYSTEM_F", "SOURCE"),
        _srec(b"SYSTEM_T", "TARGET"),
        _drec(b"MAJOR_F ", 6378206.4),
        _drec(b"MINOR_F ", 6356583.8),
        _drec(b"MAJOR_T ", 6378137.0),
        _drec(b"MINOR_T ", 6356752.314),
    ]
    for g in subgrids:
        out += [
            _srec(b"SUB_NAME", g.name),
            _srec(b"PARENT  ", g.parent or "NONE"),
            _srec(b"CREATED ", "        "),
            _srec(b"UPDATED ", "        "),
            _drec(b"S_LAT   ", g.s_lat),
            _drec(b"N_LAT   ", g.n_lat),
            _drec(b"E_LONG  ", g.e_long),
            _drec(b"W_LONG  ", g.w_long),
            _drec(b"LAT_INC ", g.lat_inc),
            _drec(b"LONG_INC", g.long_inc),
            _irec(b"GS_COUNT", g.nrows * g.ncols),
        ]
        node = np.empty((g.nrows * g.ncols, 4), dtype="<f4")
        node[:, 0] = g.lat_shift.reshape(-1).astype(np.float32)
        node[:, 1] = g.lon_shift.reshape(-1).astype(np.float32)
        node[:, 2:] = 0.0  # accuracies (unused by the transform)
        out.append(node.tobytes())
    return b"".join(out)


def parse_ntv2(data: bytes) -> list[NTv2SubGrid]:
    """Parse ``.gsb`` bytes. Handles both little- and big-endian files
    (the spec predates a fixed byte order; PROJ sniffs NUM_OREC the same
    way)."""
    if len(data) < 11 * 16:
        raise ValueError("NTv2: file shorter than the overview header")
    if data[:8].rstrip(b"\x00 ") != b"NUM_OREC":
        raise ValueError("NTv2: missing NUM_OREC overview record")
    endian = "<"
    if struct.unpack("<i", data[8:12])[0] != 11:
        if struct.unpack(">i", data[8:12])[0] == 11:
            endian = ">"
        else:
            raise ValueError("NTv2: NUM_OREC != 11 in either byte order")

    def ival(off: int) -> int:
        return struct.unpack(endian + "i", data[off + 8 : off + 12])[0]

    def dval(off: int) -> float:
        return struct.unpack(endian + "d", data[off + 8 : off + 16])[0]

    def sval(off: int) -> str:
        return data[off + 8 : off + 16].decode("ascii", "replace").strip("\x00 ")

    n_orec = ival(0)
    n_srec = ival(16)
    n_file = ival(32)
    if n_srec != 11:
        raise ValueError(f"NTv2: NUM_SREC={n_srec}, expected 11")
    # GS_TYPE governs the node-value unit. PROJ only accepts SECONDS;
    # silently treating MINUTES/DEGREES files as seconds would mis-scale
    # every shift by 60x/3600x, so reject anything else explicitly.
    gs_type = None
    for r in range(n_orec):
        raw = data[r * 16 : r * 16 + 8]
        if raw.decode("ascii", "replace").strip("\x00 ") == "GS_TYPE":
            gs_type = sval(r * 16)
            break
    if gs_type is None:
        raise ValueError("NTv2: overview header has no GS_TYPE record")
    if gs_type.upper() != "SECONDS":
        raise ValueError(
            f"NTv2: GS_TYPE={gs_type!r} unsupported — only SECONDS grids "
            "are accepted (matching PROJ)"
        )
    off = n_orec * 16
    grids: list[NTv2SubGrid] = []
    for _ in range(n_file):
        hdr = {}
        for r in range(11):
            raw = data[off + r * 16 : off + r * 16 + 8]
            # spec says space-padded but real writers NUL-pad too (the
            # overview check above tolerates both) — strip both
            name = raw.decode("ascii", "replace").strip("\x00 ")
            hdr[name] = off + r * 16
        try:
            sub = sval(hdr["SUB_NAME"])
            parent = sval(hdr["PARENT"])
            s_lat, n_lat = dval(hdr["S_LAT"]), dval(hdr["N_LAT"])
            e_lon, w_lon = dval(hdr["E_LONG"]), dval(hdr["W_LONG"])
            lat_inc, lon_inc = dval(hdr["LAT_INC"]), dval(hdr["LONG_INC"])
            count = ival(hdr["GS_COUNT"])
        except KeyError as e:
            raise ValueError(f"NTv2: subgrid header missing record {e}") from None
        if not (lat_inc > 0.0 and lon_inc > 0.0):
            raise ValueError(
                f"NTv2: non-positive LAT_INC/LONG_INC "
                f"({lat_inc}, {lon_inc}) in subgrid {sub!r}"
            )
        ncols = int(round((w_lon - e_lon) / lon_inc)) + 1
        nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
        if nrows * ncols != count:
            raise ValueError(
                f"NTv2: GS_COUNT={count} != nrows*ncols={nrows}*{ncols} in {sub!r}"
            )
        if nrows < 2 or ncols < 2:
            # a single-row/column grid cannot be bilinearly interpolated
            # (the index clip would wrap to the far edge and read wrong nodes)
            raise ValueError(
                f"NTv2: degenerate subgrid {sub!r} ({nrows}x{ncols}) — "
                "at least 2 rows and 2 columns are required"
            )
        off += 11 * 16
        node = np.frombuffer(data, dtype=endian + "f4", count=count * 4, offset=off)
        node = node.reshape(count, 4).astype(np.float64)
        grids.append(
            NTv2SubGrid(
                name=sub,
                parent=parent,
                s_lat=s_lat,
                n_lat=n_lat,
                e_long=e_lon,
                w_long=w_lon,
                lat_inc=lat_inc,
                long_inc=lon_inc,
                lat_shift=node[:, 0].reshape(nrows, ncols),
                lon_shift=node[:, 1].reshape(nrows, ncols),
            )
        )
        off += count * 16
    return grids


def register_nadgrid(name: str, data: bytes | list[NTv2SubGrid]) -> None:
    """Install a grid under ``name`` so ``+nadgrids=name`` resolves.
    ``data`` is raw ``.gsb`` bytes or pre-built subgrids."""
    _GRIDS[name] = parse_ntv2(data) if isinstance(data, (bytes, bytearray)) else list(data)


def unregister_nadgrid(name: str) -> None:
    _GRIDS.pop(name, None)


def _resolve(names: str) -> list[NTv2SubGrid]:
    """``+nadgrids`` value → flat subgrid list. ``@name`` marks a grid as
    optional (skipped when unregistered); a bare missing name raises."""
    grids: list[NTv2SubGrid] = []
    for tok in names.split(","):
        tok = tok.strip()
        optional = tok.startswith("@")
        key = tok[1:] if optional else tok
        if key == "null":
            continue
        found = _GRIDS.get(key)
        if found is None:
            if optional:
                continue
            raise ValueError(
                f"+nadgrids={key!r} is not registered — call "
                "register_nadgrid(name, gsb_bytes) first (or prefix with @ "
                "to make it optional)"
            )
        grids.extend(found)
    # Finest (smallest cell) first so child grids win over their parents,
    # matching PROJ's most-detailed-subgrid selection. Cell-area ties are
    # broken by the NTv2 PARENT hierarchy — deeper descendants first — so
    # equal-increment overlapping subgrids resolve like PROJ's
    # densest-containing-subgrid walk instead of registration order.
    by_name = {g.name: g for g in grids}

    def depth(g: NTv2SubGrid) -> int:
        d, seen = 0, {g.name}
        while g.parent and g.parent != "NONE" and g.parent in by_name:
            g = by_name[g.parent]
            if g.name in seen:  # defensive: cyclic PARENT chain
                break
            seen.add(g.name)
            d += 1
        return d

    grids.sort(key=lambda g: (g.lat_inc * g.long_inc, -depth(g)))
    return grids


def _forward_shift(
    grids: list[NTv2SubGrid], lon: np.ndarray, lat: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """source-datum → target-datum degrees (vectorized; unmatched points
    pass through)."""
    out_lon = np.array(lon, dtype=np.float64, copy=True)
    out_lat = np.array(lat, dtype=np.float64, copy=True)
    unassigned = np.ones(out_lon.shape, dtype=bool)
    for g in grids:
        m = unassigned & g.contains(lon, lat)
        if not m.any():
            continue
        dphi, dlam = g.interpolate(np.asarray(lon)[m], np.asarray(lat)[m])
        out_lat[m] = np.asarray(lat)[m] + dphi / 3600.0
        out_lon[m] = np.asarray(lon)[m] - dlam / 3600.0  # west-positive → east
        unassigned[m] = False
    return out_lon, out_lat


def _inverse_shift(
    grids: list[NTv2SubGrid], lon: np.ndarray, lat: np.ndarray, iterations: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """target-datum → source-datum by fixed-point iteration of the
    forward shift (PROJ's inverse strategy)."""
    lon_t = np.asarray(lon, dtype=np.float64)
    lat_t = np.asarray(lat, dtype=np.float64)
    lon_s = lon_t.copy()
    lat_s = lat_t.copy()
    for _ in range(iterations):
        f_lon, f_lat = _forward_shift(grids, lon_s, lat_s)
        lon_s = lon_s - (f_lon - lon_t)
        lat_s = lat_s - (f_lat - lat_t)
    return lon_s, lat_s


def grid_pair(names: str):
    """(from_wgs84, to_wgs84) lon/lat callables for ``+nadgrids=names`` —
    the same contract as proj4._datum_pair. The grid's target datum is
    taken as WGS84-equivalent (NAD83≈WGS84 at NTv2 accuracy, PROJ's own
    assumption for these grids)."""
    grids = _resolve(names)

    def to_wgs84(lon, lat):
        return _forward_shift(grids, lon, lat)

    def from_wgs84(lon, lat):
        return _inverse_shift(grids, lon, lat)

    return from_wgs84, to_wgs84


def grid_coverage_mask(names: str, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """True where at least one subgrid covers the point — lets callers
    enforce strict coverage before trusting pass-through behaviour."""
    grids = _resolve(names)
    m = np.zeros(np.asarray(lon).shape, dtype=bool)
    for g in grids:
        m |= g.contains(lon, lat)
    return m
