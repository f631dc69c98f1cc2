"""General polygon overlay: intersection/union/difference/xor of arbitrary
(multi)polygons with holes.

Algorithm — classify-and-stitch (the conceptual shape of GEOS OverlayNG,
re-derived from first principles):

1. node: split every boundary segment of A and B at crossings/touches with
   the other geometry's segments;
2. classify: for each sub-segment, probe a point slightly left and slightly
   right of its midpoint against the boolean result predicate
   ``R(p) = op(inside_A(p), inside_B(p))``. The sub-segment lies on the
   result boundary iff the two sides disagree; orient it so the result
   interior is on its left;
3. stitch: walk directed edges into rings (most-counterclockwise turn at
   junctions), positive-area rings become shells, negative-area rings holes,
   holes assigned to shells by containment.

Complexity O((n+m)²) per geometry pair — fine for per-row geometry sizes;
scale comes from Spark parallelism, not from this kernel. Tolerances: the
left/right probes sit 1e-9·scale off the edge, so results are exact for
coordinates with |x| ≲ 1e6 and features larger than ~1e-7.
"""

from __future__ import annotations

import math

import numpy as np

from polars_st_spark.geo.algos import _closed, _ring_signed_area
from polars_st_spark.geo.predicates import (
    _seg_intersect_kind,
    point_in_polygon,
)
from polars_st_spark.geo.types import Geometry, GeometryType

__all__ = ["overlay"]

_OPS = {
    "intersection": lambda a, b: a and b,
    "union": lambda a, b: a or b,
    "difference": lambda a, b: a and not b,
    "symmetric_difference": lambda a, b: a != b,
}


def _polygons_of(g: Geometry) -> list[list[np.ndarray]]:
    """All polygons as ring lists (closed, 2-D)."""
    out = []
    if g.type_id in (GeometryType.Polygon, GeometryType.Triangle) and g.rings:
        out.append([_closed(np.asarray(r)[:, :2]) for r in g.rings])
    elif g.geoms:
        for s in g.geoms:
            out.extend(_polygons_of(s))
    return out


def _segments(polys) -> list[tuple[np.ndarray, np.ndarray]]:
    segs = []
    for rings in polys:
        for r in rings:
            for i in range(len(r) - 1):
                if not np.array_equal(r[i], r[i + 1]):
                    segs.append((r[i], r[i + 1]))
    return segs


def _seg_param(a, b, p) -> float:
    dx, dy = b[0] - a[0], b[1] - a[1]
    if abs(dx) >= abs(dy):
        return 0.0 if dx == 0 else (p[0] - a[0]) / dx
    return (p[1] - a[1]) / dy


def _split_at_crossings(segs, other_segs):
    """Split each segment at every intersection with the other set."""
    out = []
    for a, b in segs:
        ts = {0.0, 1.0}
        for c, e in other_segs:
            kind = _seg_intersect_kind(a, b, c, e)
            if kind == 0:
                continue
            if kind == 2:
                den = (a[0] - b[0]) * (c[1] - e[1]) - (a[1] - b[1]) * (c[0] - e[0])
                if den != 0:
                    t = ((a[0] - c[0]) * (c[1] - e[1]) - (a[1] - c[1]) * (c[0] - e[0])) / den
                    ts.add(min(max(t, 0.0), 1.0))
            else:  # touch or collinear overlap: split at projected endpoints
                for p in (c, e):
                    t = _seg_param(a, b, p)
                    if 0.0 < t < 1.0:
                        from polars_st_spark.geo.predicates import _on_segment

                        if _on_segment(p, a, b):
                            ts.add(t)
        tl = sorted(ts)
        for t0, t1 in zip(tl[:-1], tl[1:]):
            if t1 - t0 > 1e-12:
                out.append((a + t0 * (b - a), a + t1 * (b - a)))
    return out


def _inside(polys, p) -> bool:
    """Point strictly inside the (multi)polygon region (even-odd over parts
    with holes)."""
    for rings in polys:
        loc = point_in_polygon(p, rings)
        if loc == 2:
            return True
        if loc == 1:
            return True  # probes should not land on boundaries; treat as in
    return False


def self_union(g: Geometry) -> Geometry:
    """Resolve a self-intersecting polygon into its valid even-odd region —
    the make_valid kernel for bow-ties and self-touching rings
    (reference: functions.rs:1397-1399). Self-nodes the boundary, then
    classifies with the even-odd ray cast (which is well-defined even on
    invalid rings)."""
    pa = _polygons_of(g)
    sa = _segments(pa)
    pieces = _split_at_crossings(sa, sa)
    return _classify_and_stitch(pieces, lambda p: _inside(pa, p), g.srid, [sa])


def overlay(a: Geometry, b: Geometry, op: str, _snapped: bool = False) -> Geometry:
    if op not in _OPS:
        raise ValueError(f"Unknown overlay op {op!r}")
    pa = _polygons_of(a)
    pb = _polygons_of(b)
    srid = a.srid or b.srid
    R = _OPS[op]

    sa = _segments(pa)
    sb = _segments(pb)
    # node each side against BOTH sets: multipolygon parts can have
    # T-junctions among their own rings (edge passing through another ring's
    # vertex) — without self-noding the ring walk dead-ends there
    both = sa + sb
    pieces_a = _split_at_crossings(sa, both)
    pieces_b = _split_at_crossings(sb, both)
    pieces = pieces_a + pieces_b
    out = _classify_and_stitch(
        pieces, lambda p: R(_inside(pa, p), _inside(pb, p)), srid, [sa, sb]
    )
    # Robustness net for sub-tolerance parallel boundaries (e.g. a 2e-8
    # vertex sitting just off the other polygon's edge): the classification
    # probe is capped at 40% of the distance to the nearest edge, but never
    # below base_eps — so when that distance is itself below base_eps, BOTH
    # probes land across the nearby edge and whole boundary pieces classify
    # away (found by tests/test_overlay_adversarial.py). Detect it by
    # inclusion-exclusion: the intersection kernel is the robust base case
    # (slivers node exactly), so area(union) must be aa+ab-ai,
    # area(difference) aa-ai, area(symmetric_difference) aa+ab-2*ai, all
    # within the noding envelope. On violation (or an impossible empty
    # union), snap the inputs to the node grid — collapsing the jitter to an
    # exact shared edge/touch, which classifies exactly — and retry once.
    # The (~2x-cost) cross-check only runs when the cheap noding-derived
    # suspicion signal fires: some noded vertex of one side sits NEAR (but
    # not exactly on) the other side's boundary — the only configuration
    # the probe capping can misclassify (ADVICE r3: don't pay the extra
    # intersection overlay on the clean common path). Union is cross-checked
    # under the same signal, not just for emptiness.
    if not _snapped and op != "intersection" and (pa or pb):
        scale, perim = 1.0, 0.0
        for p, q in both:
            scale = max(scale, abs(p[0]), abs(p[1]), abs(q[0]), abs(q[1]))
            perim += math.hypot(q[0] - p[0], q[1] - p[1])
        suspect = out.is_empty() and op == "union"
        if not suspect and (
            _near_coincident(pieces_a, sb, scale) or _near_coincident(pieces_b, sa, scale)
        ):
            from polars_st_spark.geo.algos import area as _area

            aa, ab = _area(a), _area(b)
            ai = _area(overlay(a, b, "intersection", _snapped=True))
            expected = {
                "union": aa + ab - ai,
                "difference": aa - ai,
                "symmetric_difference": aa + ab - 2.0 * ai,
            }[op]
            envelope = max(1e-12, 1e-7 * scale * perim)
            suspect = abs(_area(out) - expected) > envelope
        if suspect:
            grid = 4e-9 * scale
            return overlay(
                _snap_to_grid(a, grid), _snap_to_grid(b, grid), op, _snapped=True
            )
    return out


def _near_coincident(pieces, other_segs, scale) -> bool:
    """Cheap suspicion signal: does any noded vertex of one side lie NEAR
    (within 1e-7·scale) but not exactly on the other side's boundary?

    Exactly-on (distance 0.0 — shared vertices, T-touches on axis-parallel
    edges, noding split points) classifies exactly and is benign; only the
    near-miss band can defeat the capped probes. O(V·E) vectorized; very
    large inputs skip the scan and conservatively report True (the
    cross-check then runs, as it always did before this gate existed)."""
    if not pieces or not other_segs:
        return False
    pts = np.asarray([p for p, _ in pieces] + [q for _, q in pieces], dtype=np.float64)
    if len(pts) * len(other_segs) > 4_000_000:
        return True
    from polars_st_spark.geo.algos import _seg_dist_point

    band = 1e-7 * scale
    px, py = pts[:, 0], pts[:, 1]
    for p, q in other_segs:
        d = _seg_dist_point(px, py, p[0], p[1], q[0], q[1])
        near = d[(d > 0.0) & (d < band)]
        if len(near):
            return True
    return False


def _snap_to_grid(g: Geometry, grid: float) -> Geometry:
    def f(arr: np.ndarray) -> np.ndarray:
        out = arr.copy()
        out[:, :2] = np.round(arr[:, :2] / grid) * grid
        return out

    return g.map_coords(f)


def _classify_and_stitch(pieces, region_fn, srid, seg_sets):

    scale = 1.0
    for segs in seg_sets:
        for p, q in segs:
            scale = max(scale, abs(p[0]), abs(p[1]))
    base_eps = 1e-9 * scale

    # all boundary segments as arrays, for probe-distance capping
    seg_c = []
    seg_d = []
    for segs in seg_sets:
        for p, q in segs:
            seg_c.append(p[:2])
            seg_d.append(q[:2] - p[:2])
    C = np.asarray(seg_c, dtype=np.float64).reshape(-1, 2)
    D = np.asarray(seg_d, dtype=np.float64).reshape(-1, 2)

    def _probe_caps(m, nx, ny):
        """Nearest hit distance along ±(nx,ny) from m to any boundary
        segment — the probe must stay inside the local face, so it can never
        cross another edge (sliver-safe classification)."""
        if len(C) == 0:
            return math.inf, math.inf
        denom = nx * D[:, 1] - ny * D[:, 0]
        ok = np.abs(denom) > 1e-300
        delta = C - m
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (delta[:, 0] * D[:, 1] - delta[:, 1] * D[:, 0]) / denom
            s = (delta[:, 0] * ny - delta[:, 1] * nx) / denom
        hit = ok & (s >= -1e-12) & (s <= 1.0 + 1e-12)
        tpos = t[hit & (t > base_eps)]
        tneg = t[hit & (t < -base_eps)]
        return (tpos.min() if len(tpos) else math.inf,
                (-tneg).min() if len(tneg) else math.inf)

    edges = []  # directed (start, end) with result-interior on the left
    for p, q in pieces:
        d = q - p
        ln = math.hypot(d[0], d[1])
        if ln < 1e-12:
            continue
        nx, ny = -d[1] / ln, d[0] / ln
        m = (p + q) / 2.0
        # probe distance adapts to the sub-segment length (near-tangent
        # intersections position nodes with error larger than a fixed 1e-9)
        # but is capped at 40% of the distance to the nearest other edge
        # along the probe ray — otherwise a probe wider than a sliver face
        # lands outside it and the sliver's edges are silently dropped
        # (found by tests/test_overlay_adversarial.py)
        eps = max(base_eps, min(1e-4 * scale, 0.2 * ln))
        cap_l, cap_r = _probe_caps(m, nx, ny)
        eps_l = max(base_eps, min(eps, 0.4 * cap_l))
        eps_r = max(base_eps, min(eps, 0.4 * cap_r))
        left = m + eps_l * np.array([nx, ny])
        right = m - eps_r * np.array([nx, ny])
        rl = region_fn(left)
        rr = region_fn(right)
        if rl == rr:
            continue
        if rl:
            edges.append((p, q))
        else:
            edges.append((q, p))

    if not edges:
        return Geometry(GeometryType.Polygon, srid=srid, rings=[])

    # Node unification by PROXIMITY, not decimal rounding: two instances of
    # the same junction may carry up to ~base_eps of node-placement error,
    # and a fixed round(x, 9) grid both merges distinct 1e-9-scale features
    # and splits equal nodes that straddle a rounding boundary (a 1e-9
    # vertex jitter used to dead-end the ring walk and return EMPTY — found
    # by tests/test_overlay_adversarial.py).
    ngrid = max(base_eps * 4.0, 1e-12)
    _cells: dict[tuple, list[int]] = {}
    _nodes: list[tuple] = []

    def key(p):
        x, y = float(p[0]), float(p[1])
        cx, cy = math.floor(x / ngrid), math.floor(y / ngrid)
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                for nid in _cells.get((cx + dx, cy + dy), ()):
                    qx, qy = _nodes[nid]
                    if abs(qx - x) <= ngrid and abs(qy - y) <= ngrid:
                        return nid
        nid = len(_nodes)
        _nodes.append((x, y))
        _cells.setdefault((cx, cy), []).append(nid)
        return nid

    # dedupe identical directed edges (shared boundaries emit twice) and
    # drop edges whose endpoints collapse to one node (sub-tolerance)
    uniq = {}
    for p, q in edges:
        kp, kq = key(p), key(q)
        if kp != kq:
            uniq[(kp, kq)] = (p, q)
    edges = list(uniq.values())
    if not edges:
        return Geometry(GeometryType.Polygon, srid=srid, rings=[])

    # stitch rings: at junctions take the most-counterclockwise turn
    out_edges: dict[int, list[int]] = {}
    for i, (p, q) in enumerate(edges):
        out_edges.setdefault(key(p), []).append(i)
    used = [False] * len(edges)
    rings = []
    for start in range(len(edges)):
        if used[start]:
            continue
        p0, q0 = edges[start]
        used[start] = True
        chain = [p0, q0]
        prev_p, cur_q = p0, q0
        closed = False
        for _ in range(len(edges) + 1):
            if key(cur_q) == key(p0):
                closed = True
                break
            cands = [i for i in out_edges.get(key(cur_q), []) if not used[i]]
            if not cands:
                break
            if len(cands) == 1:
                pick = cands[0]
            else:
                # most-counterclockwise turn relative to the incoming direction
                din = cur_q - prev_p
                ang_in = math.atan2(din[1], din[0])

                def turn(i):
                    dp, dq = edges[i]
                    dout = dq - dp
                    ang = math.atan2(dout[1], dout[0]) - (ang_in + math.pi)
                    while ang <= 0:
                        ang += 2 * math.pi
                    return ang

                pick = min(cands, key=turn)
            used[pick] = True
            pe, qe = edges[pick]
            chain.append(qe)
            prev_p, cur_q = pe, qe
        if closed and len(chain) >= 4:
            ring = np.array(chain)
            if abs(_ring_signed_area(ring)) > 1e-18:
                rings.append(ring)

    if not rings:
        return Geometry(GeometryType.Polygon, srid=srid, rings=[])

    shells = [r for r in rings if _ring_signed_area(r) > 0]
    holes = [r for r in rings if _ring_signed_area(r) < 0]
    if not shells:
        return Geometry(GeometryType.Polygon, srid=srid, rings=[])
    polys = [[s] for s in shells]
    for h in holes:
        # assign hole to the smallest containing shell
        hx = h[0]
        best, best_area = None, math.inf
        for i, s in enumerate(shells):
            from polars_st_spark.geo.predicates import _point_in_ring

            inside = any(
                _point_in_ring((h[j] + h[j + 1]) / 2.0, s) == 2 for j in range(min(3, len(h) - 1))
            )
            if inside:
                ar = abs(_ring_signed_area(s))
                if ar < best_area:
                    best, best_area = i, ar
        if best is not None:
            polys[best].append(h)
    if len(polys) == 1:
        return Geometry(GeometryType.Polygon, srid=srid, rings=polys[0])
    return Geometry(
        GeometryType.MultiPolygon,
        srid=srid,
        geoms=[Geometry(GeometryType.Polygon, srid=srid, rings=rs) for rs in polys],
    )
