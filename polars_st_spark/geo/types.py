"""Geometry object model.

A small tagged-union geometry type backed by numpy coordinate arrays.
Coordinate order is always XY[Z][M]. SRID is carried per value, mirroring the
reference's per-value EWKB SRID flag (reference: src/wkb.rs:23-27).

Type ids follow OGC WKB (reference: src/wkb.rs:49-68, polars_st/geometry.py:9-28).
"""

from __future__ import annotations

from enum import IntEnum

import numpy as np

__all__ = ["GeometryType", "Geometry", "GEOMETRY_TYPE_NAMES"]


class GeometryType(IntEnum):
    Unknown = 0
    Point = 1
    LineString = 2
    Polygon = 3
    MultiPoint = 4
    MultiLineString = 5
    MultiPolygon = 6
    GeometryCollection = 7
    CircularString = 8
    CompoundCurve = 9
    CurvePolygon = 10
    MultiCurve = 11
    MultiSurface = 12
    Curve = 13
    Surface = 14
    PolyhedralSurface = 15
    Tin = 16
    Triangle = 17


GEOMETRY_TYPE_NAMES = {t.value: t.name for t in GeometryType}

# type ids whose payload is a single coordinate sequence
_LINEAL_IDS = (GeometryType.LineString, GeometryType.CircularString)
# type ids whose payload is a list of rings
_POLYGONAL_IDS = (GeometryType.Polygon, GeometryType.Triangle)
# type ids whose payload is a list of sub-geometries
_COLLECTION_IDS = (
    GeometryType.MultiPoint,
    GeometryType.MultiLineString,
    GeometryType.MultiPolygon,
    GeometryType.GeometryCollection,
    GeometryType.CompoundCurve,
    GeometryType.CurvePolygon,
    GeometryType.MultiCurve,
    GeometryType.MultiSurface,
    GeometryType.PolyhedralSurface,
    GeometryType.Tin,
)


class Geometry:
    """Tagged-union geometry.

    - Point: ``coords`` is a 1-D float64 array of length ``ndim`` (or None if empty)
    - LineString / CircularString: ``coords`` is (n, ndim)
    - Polygon / Triangle: ``rings`` is a list of (n, ndim) arrays (first = exterior)
    - Multi* / GeometryCollection / other compound: ``geoms`` is a list of Geometry
    """

    __slots__ = ("type_id", "srid", "has_z", "has_m", "coords", "rings", "geoms")

    def __init__(
        self,
        type_id: int,
        *,
        srid: int = 0,
        has_z: bool = False,
        has_m: bool = False,
        coords: np.ndarray | None = None,
        rings: list[np.ndarray] | None = None,
        geoms: list["Geometry"] | None = None,
    ) -> None:
        self.type_id = int(type_id)
        self.srid = int(srid)
        self.has_z = bool(has_z)
        self.has_m = bool(has_m)
        self.coords = coords
        self.rings = rings
        self.geoms = geoms

    # ------------------------------------------------------------------
    @property
    def ndim(self) -> int:
        return 2 + self.has_z + self.has_m

    @property
    def type_name(self) -> str:
        return GEOMETRY_TYPE_NAMES.get(self.type_id, "Unknown")

    def is_empty(self) -> bool:
        t = self.type_id
        if t == GeometryType.Point:
            return self.coords is None or (
                len(self.coords) > 0 and bool(np.isnan(self.coords[0]))
            )
        if t in _LINEAL_IDS:
            return self.coords is None or len(self.coords) == 0
        if t in _POLYGONAL_IDS:
            return not self.rings
        if self.geoms is not None:
            return all(g.is_empty() for g in self.geoms) if self.geoms else True
        return True

    # topological dimension: 0 point, 1 line, 2 area; -1 for empty collection
    # (reference: functions.rs:416-425)
    def dimensions(self) -> int:
        t = self.type_id
        if t == GeometryType.Point or t == GeometryType.MultiPoint:
            return 0
        if t in (
            GeometryType.LineString,
            GeometryType.MultiLineString,
            GeometryType.CircularString,
            GeometryType.CompoundCurve,
            GeometryType.MultiCurve,
            GeometryType.Curve,
        ):
            return 1
        if t in (
            GeometryType.Polygon,
            GeometryType.MultiPolygon,
            GeometryType.CurvePolygon,
            GeometryType.MultiSurface,
            GeometryType.Surface,
            GeometryType.PolyhedralSurface,
            GeometryType.Tin,
            GeometryType.Triangle,
        ):
            return 2
        if t == GeometryType.GeometryCollection:
            if not self.geoms:
                return -1
            return max(g.dimensions() for g in self.geoms)
        return 0

    # ------------------------------------------------------------------
    def raw_coords(self) -> np.ndarray:
        """Stored coordinates (curve control points included verbatim) —
        what count_coordinates / coordinates report."""
        return self._collect_coords(linearize_curves=False)

    def all_coords(self) -> np.ndarray:
        """All coordinates as one (n, ndim) array (copy-light where possible).

        Curved geometries are linearized first so bounds/hulls account for
        arc bulge beyond the control points."""
        return self._collect_coords(linearize_curves=True)

    def _collect_coords(self, linearize_curves: bool) -> np.ndarray:
        if linearize_curves and self.type_id in (
            GeometryType.CircularString,
            GeometryType.CompoundCurve,
            GeometryType.CurvePolygon,
            GeometryType.MultiCurve,
            GeometryType.MultiSurface,
        ):
            from polars_st_spark.geo.curves import linearize

            return linearize(self).all_coords()
        t = self.type_id
        if t == GeometryType.Point:
            if self.coords is None:
                return np.empty((0, self.ndim))
            return self.coords.reshape(1, -1)
        if t in _LINEAL_IDS:
            if self.coords is None:
                return np.empty((0, self.ndim))
            return self.coords
        if t in _POLYGONAL_IDS:
            if not self.rings:
                return np.empty((0, self.ndim))
            return np.concatenate(self.rings, axis=0)
        if self.geoms:
            parts = [g._collect_coords(linearize_curves) for g in self.geoms]
            parts = [p for p in parts if len(p)]
            if not parts:
                return np.empty((0, self.ndim))
            return np.concatenate(parts, axis=0)
        return np.empty((0, self.ndim))

    def bounds(self) -> tuple[float, float, float, float]:
        """(xmin, ymin, xmax, ymax); NaN if empty (reference: functions.rs:798-813).

        Curved geometries use exact arc extrema (curves.extreme_points), so
        the box covers the true bulge, not a chord approximation."""
        from polars_st_spark.geo.curves import _is_curved, extreme_points

        c = extreme_points(self) if _is_curved(self) else self.all_coords()
        if len(c) == 0:
            nan = float("nan")
            return (nan, nan, nan, nan)
        return (
            float(c[:, 0].min()),
            float(c[:, 1].min()),
            float(c[:, 0].max()),
            float(c[:, 1].max()),
        )

    def with_srid(self, srid: int) -> "Geometry":
        g = self.copy(deep=False)
        g.srid = srid
        if g.geoms is not None:
            g.geoms = [sub.with_srid(srid) for sub in g.geoms]
        return g

    def copy(self, deep: bool = True) -> "Geometry":
        return Geometry(
            self.type_id,
            srid=self.srid,
            has_z=self.has_z,
            has_m=self.has_m,
            coords=(self.coords.copy() if (deep and self.coords is not None) else self.coords),
            rings=([r.copy() for r in self.rings] if (deep and self.rings is not None) else self.rings),
            geoms=([g.copy(deep) for g in self.geoms] if (deep and self.geoms is not None) else self.geoms),
        )

    # map f over every coordinate array, returning a structurally identical geometry.
    def map_coords(self, f) -> "Geometry":
        t = self.type_id
        if t == GeometryType.Point:
            new = None if self.coords is None else np.asarray(f(self.coords.reshape(1, -1)))[0]
            return Geometry(t, srid=self.srid, has_z=self.has_z, has_m=self.has_m, coords=new)
        if t in _LINEAL_IDS:
            new = None if self.coords is None else np.asarray(f(self.coords))
            return Geometry(t, srid=self.srid, has_z=self.has_z, has_m=self.has_m, coords=new)
        if t in _POLYGONAL_IDS:
            rings = None if self.rings is None else [np.asarray(f(r)) for r in self.rings]
            return Geometry(t, srid=self.srid, has_z=self.has_z, has_m=self.has_m, rings=rings)
        geoms = None if self.geoms is None else [g.map_coords(f) for g in self.geoms]
        return Geometry(t, srid=self.srid, has_z=self.has_z, has_m=self.has_m, geoms=geoms)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        from polars_st_spark.geo.wkt import to_wkt

        s = to_wkt(self)
        if len(s) > 80:
            s = s[:77] + "..."
        return f"<Geometry {s!r} srid={self.srid}>"

    def __eq__(self, other: object) -> bool:
        """Structural equality (same type, dims, srid, exact coords)."""
        if not isinstance(other, Geometry):
            return NotImplemented
        from polars_st_spark.geo.wkb import to_ewkb

        return to_ewkb(self) == to_ewkb(other)

    def __hash__(self) -> int:
        from polars_st_spark.geo.wkb import to_ewkb

        return hash(to_ewkb(self))


def empty_collection(srid: int = 0) -> Geometry:
    """GEOMETRYCOLLECTION EMPTY — the aggregation identity
    (reference: expressions.rs:882,910,944,995)."""
    return Geometry(GeometryType.GeometryCollection, srid=srid, geoms=[])
