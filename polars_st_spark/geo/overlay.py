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

_OPS_VEC = {
    "intersection": lambda a, b: a & b,
    "union": lambda a, b: a | b,
    "difference": lambda a, b: a & ~b,
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


def _grid_join(abb, obb, margin):
    """Candidate ``(ia, io)`` pairs whose boxes, with ``abb`` dilated by
    ``margin``, may intersect — a guaranteed superset built by a uniform
    grid join (cell = max box extent), possibly with duplicates. Callers
    apply the exact 4-way box test on the candidates."""
    na, no = len(abb), len(obb)
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if not na or not no:
        return empty
    # cell size: the median box extent balances registrations-per-box
    # (a long box covers many cells) against partners-per-cell (a huge
    # cell collects everything); the max/16 floor bounds the worst box's
    # registration count. Correctness holds for ANY h — both sides
    # register every covered cell.
    exts = np.concatenate([
        np.maximum(abb[:, 2] - abb[:, 0], abb[:, 3] - abb[:, 1]),
        np.maximum(obb[:, 2] - obb[:, 0], obb[:, 3] - obb[:, 1]),
    ])
    h = max(float(np.median(exts)), float(exts.max()) / 16.0, 1e-9) + 2.0 * margin

    def cells(bb, m):
        cx0 = np.clip(np.floor((bb[:, 0] - m) / h), -2**30, 2**30).astype(np.int64)
        cx1 = np.clip(np.floor((bb[:, 2] + m) / h), -2**30, 2**30).astype(np.int64)
        cy0 = np.clip(np.floor((bb[:, 1] - m) / h), -2**30, 2**30).astype(np.int64)
        cy1 = np.clip(np.floor((bb[:, 3] + m) / h), -2**30, 2**30).astype(np.int64)
        nx = cx1 - cx0 + 1
        ny = cy1 - cy0 + 1
        reps = nx * ny
        tot = int(reps.sum())
        idx = np.repeat(np.arange(len(bb), dtype=np.int64), reps)
        base = np.cumsum(reps) - reps
        k = np.arange(tot, dtype=np.int64) - np.repeat(base, reps)
        # row-major within each box's cell block
        off_x = k // np.repeat(ny, reps)
        off_y = k - off_x * np.repeat(ny, reps)
        key = ((cx0[idx] + off_x) << 32) | ((cy0[idx] + off_y) & 0xFFFFFFFF)
        return key, idx

    okey, oidx = cells(obb, 0.0)
    akey, aidx = cells(abb, margin)
    order = np.argsort(okey, kind="stable")
    okey_s = okey[order]
    oidx_s = oidx[order]
    lo = np.searchsorted(okey_s, akey, side="left")
    hi = np.searchsorted(okey_s, akey, side="right")
    counts = hi - lo
    tot = int(counts.sum())
    if not tot:
        return empty
    ia = np.repeat(aidx, counts)
    base = np.cumsum(counts) - counts
    pos = np.arange(tot, dtype=np.int64) - np.repeat(base, counts) + np.repeat(lo, counts)
    io = oidx_s[pos]
    return ia, io


def _split_at_crossings(segs, other_segs):
    """Split each segment at every intersection with the other set.

    Vectorized over the full pair product (chunked), reproducing the
    scalar ``_seg_intersect_kind`` classification arithmetic per pair:
    proper crossings contribute the clipped den/t parameter; touch and
    collinear pairs contribute the other segment's endpoints projected
    with the dominant-axis ``_seg_param`` formula where they lie on the
    segment."""
    from polars_st_spark.geo.predicates import _EPS

    na = len(segs)
    if not na:
        return []
    A = np.empty((na, 4), dtype=np.float64)
    for i, (p, q) in enumerate(segs):
        A[i, 0], A[i, 1], A[i, 2], A[i, 3] = p[0], p[1], q[0], q[1]
    no = len(other_segs)
    O = np.empty((no, 4), dtype=np.float64)
    for i, (c, e) in enumerate(other_segs):
        O[i, 0], O[i, 1], O[i, 2], O[i, 3] = c[0], c[1], e[0], e[1]

    seg_i = [np.arange(na, dtype=np.int64), np.arange(na, dtype=np.int64)]
    seg_t = [np.zeros(na), np.ones(na)]
    # bbox prefilter: every split source (proper crossing, _on_segment
    # touch with its absolute ±_EPS box test, collinear overlap with its
    # ±_EPS extent test) requires the two segments' boxes dilated by _EPS
    # to meet — pairs farther apart contribute nothing, exactly. The
    # candidate set is built sparsely: an x-interval join (sorted O starts,
    # max-O-length back-window) then the exact 4-way bbox test — never the
    # dense na×no enumeration.
    Abb = np.stack([np.minimum(A[:, 0], A[:, 2]), np.minimum(A[:, 1], A[:, 3]),
                    np.maximum(A[:, 0], A[:, 2]), np.maximum(A[:, 1], A[:, 3])], 1)
    Obb = np.stack([np.minimum(O[:, 0], O[:, 2]), np.minimum(O[:, 1], O[:, 3]),
                    np.maximum(O[:, 0], O[:, 2]), np.maximum(O[:, 1], O[:, 3])], 1)
    margin = 4.0 * _EPS
    ia_all, io_all = _grid_join(Abb, Obb, margin)
    cand_tot = len(ia_all)
    CH = 1 << 21
    for lo in range(0, cand_tot, CH):
        hi = min(lo + CH, cand_tot)
        ia = ia_all[lo:hi]
        io = io_all[lo:hi]
        near = (
            (Abb[ia, 0] <= Obb[io, 2] + margin) & (Obb[io, 0] <= Abb[ia, 2] + margin)
            & (Abb[ia, 1] <= Obb[io, 3] + margin) & (Obb[io, 1] <= Abb[ia, 3] + margin)
        )
        sel = np.nonzero(near)[0]
        if not len(sel):
            continue
        ia = ia[sel]
        io = io[sel]
        ax, ay, bx, by = A[ia, 0], A[ia, 1], A[ia, 2], A[ia, 3]
        cx, cy, ex, ey = O[io, 0], O[io, 1], O[io, 2], O[io, 3]
        d1 = (ex - cx) * (ay - cy) - (ey - cy) * (ax - cx)
        d2 = (ex - cx) * (by - cy) - (ey - cy) * (bx - cx)
        d3 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        d4 = (bx - ax) * (ey - ay) - (by - ay) * (ex - ax)
        sc_ab = np.maximum(np.maximum(np.abs(bx - ax), np.abs(by - ay)), 1.0)
        sc_ce = np.maximum(np.maximum(np.abs(ex - cx), np.abs(ey - cy)), 1.0)
        tol = _EPS * sc_ce * sc_ab
        proper = (
            ((d1 > tol) & (d2 < -tol)) | ((d1 < -tol) & (d2 > tol))
        ) & (((d3 > tol) & (d4 < -tol)) | ((d3 < -tol) & (d4 > tol)))
        pm = np.nonzero(proper)[0]
        if len(pm):
            den = ((ax[pm] - bx[pm]) * (cy[pm] - ey[pm])
                   - (ay[pm] - by[pm]) * (cx[pm] - ex[pm]))
            ok = den != 0
            t = ((ax[pm] - cx[pm]) * (cy[pm] - ey[pm])
                 - (ay[pm] - cy[pm]) * (cx[pm] - ex[pm]))
            t = t[ok] / den[ok]
            seg_i.append(ia[pm[ok]])
            seg_t.append(np.minimum(np.maximum(t, 0.0), 1.0))
        # contact pairs (touch / collinear): split at projected endpoints
        near1 = np.abs(d1) <= tol
        near2 = np.abs(d2) <= tol
        near3 = np.abs(d3) <= tol
        near4 = np.abs(d4) <= tol
        allnear = near1 & near2 & near3 & near4
        axis_x = np.abs(bx - ax) >= np.abs(by - ay)
        a1v = np.where(axis_x, ax, ay)
        b1v = np.where(axis_x, bx, by)
        c1v = np.where(axis_x, cx, cy)
        e1v = np.where(axis_x, ex, ey)
        lo_ = np.maximum(np.minimum(a1v, b1v), np.minimum(c1v, e1v))
        hi_ = np.minimum(np.maximum(a1v, b1v), np.maximum(c1v, e1v))
        col_hit = hi_ >= lo_ - _EPS  # kind 3 or endpoint-collinear kind 1

        def on_seg(px_, py_, sx, sy, tx, ty):
            cr = (tx - sx) * (py_ - sy) - (ty - sy) * (px_ - sx)
            sc = np.maximum(np.maximum(np.abs(tx - sx), np.abs(ty - sy)), 1.0)
            return (
                (np.abs(cr) <= _EPS * sc * sc)
                & (px_ >= np.minimum(sx, tx) - _EPS) & (px_ <= np.maximum(sx, tx) + _EPS)
                & (py_ >= np.minimum(sy, ty) - _EPS) & (py_ <= np.maximum(sy, ty) + _EPS)
            )

        touched = (
            (near1 & on_seg(ax, ay, cx, cy, ex, ey))
            | (near2 & on_seg(bx, by, cx, cy, ex, ey))
            | (near3 & on_seg(cx, cy, ax, ay, bx, by))
            | (near4 & on_seg(ex, ey, ax, ay, bx, by))
        )
        contact = ~proper & np.where(allnear, col_hit, touched)
        cm = np.nonzero(contact)[0]
        if len(cm):
            dx = bx[cm] - ax[cm]
            dy = by[cm] - ay[cm]
            use_x = np.abs(dx) >= np.abs(dy)
            den = np.where(use_x, dx, dy)
            safe = np.where(den != 0, den, 1.0)
            for px_, py_ in ((cx[cm], cy[cm]), (ex[cm], ey[cm])):
                num = np.where(use_x, px_ - ax[cm], py_ - ay[cm])
                t = np.where(den != 0, num / safe, 0.0)
                keep = (t > 0.0) & (t < 1.0) & on_seg(
                    px_, py_, ax[cm], ay[cm], bx[cm], by[cm])
                seg_i.append(ia[cm[keep]])
                seg_t.append(t[keep])

    all_i = np.concatenate(seg_i)
    all_t = np.concatenate(seg_t)
    order = np.lexsort((all_t, all_i))
    s, t = all_i[order], all_t[order]
    keep = np.ones(len(s), dtype=bool)
    keep[1:] = (s[1:] != s[:-1]) | (t[1:] != t[:-1])
    s, t = s[keep], t[keep]
    same = s[1:] == s[:-1]
    dt = t[1:] - t[:-1]
    sel = same & (dt > 1e-12)
    t0 = t[:-1][sel]
    t1 = t[1:][sel]
    si = s[1:][sel]
    P = A[si, :2]
    D = A[si, 2:] - A[si, :2]
    P0 = P + t0[:, None] * D
    P1 = P + t1[:, None] * D
    return [(P0[k], P1[k]) for k in range(len(si))]


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


def _ring_strict_inside_batch(ring, px, py):
    """``_point_in_ring(...) == 2`` for many probes against one ring, in one
    vectorized pass (same boundary/parity arithmetic as the scalar)."""
    from polars_st_spark.geo.predicates import _EPS

    rr = np.asarray(ring)[:, :2]
    P = len(px)
    if len(rr) < 3 or not P:
        return np.zeros(P, dtype=bool)
    ax, ay = rr[:, 0], rr[:, 1]
    bx, by = np.roll(ax, 1), np.roll(ay, 1)
    bndf = np.zeros(P, dtype=bool)
    par = np.zeros(P, dtype=np.int64)
    E = len(ax)
    CH = max(1, (1 << 22) // E)
    for lo in range(0, P, CH):
        hi = min(lo + CH, P)
        PX = px[lo:hi, None]
        PY = py[lo:hi, None]
        AX, AY, BX, BY = ax[None, :], ay[None, :], bx[None, :], by[None, :]
        cross = (BX - AX) * (PY - AY) - (BY - AY) * (PX - AX)
        sc = np.maximum(np.maximum(np.abs(BX - AX), np.abs(BY - AY)), 1.0)
        on = (
            (np.abs(cross) <= _EPS * sc * sc)
            & (PX >= np.minimum(AX, BX) - _EPS) & (PX <= np.maximum(AX, BX) + _EPS)
            & (PY >= np.minimum(AY, BY) - _EPS) & (PY <= np.maximum(AY, BY) + _EPS)
        )
        bndf[lo:hi] = on.any(axis=1)
        cond = (AY > PY) != (BY > PY)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = np.where(
                cond,
                (BX - AX) * (PY - AY) / np.where(BY - AY == 0, 1, BY - AY) + AX,
                np.inf,
            )
        par[lo:hi] = (cond & (PX < x_int)).sum(axis=1)
    return ~bndf & ((par & 1) == 1)


def _inside_batch(polys, px, py):
    """Vectorized ``_inside``: bool array over many probe points.

    One chunked probes × edges product computes, per (probe, ring), the
    boundary flag (``_on_segment`` arithmetic) and the ray-cast crossing
    parity — then the scalar ``point_in_polygon`` hole resolution runs on
    those per-ring summaries in original hole order, and a probe is
    "inside" when ANY piece locates it on boundary or interior (the
    ``_inside`` convention: probes never intentionally sit on result
    boundaries, boundary counts as in)."""
    from polars_st_spark.geo.predicates import _EPS

    P = len(px)
    res = np.zeros(P, dtype=bool)
    if not P:
        return res
    ring_of_piece: list[list[int]] = []
    ax_l, ay_l, bx_l, by_l, ring_l = [], [], [], [], []
    nrings = 0
    for rings in polys:
        mine = []
        for r in rings:
            rr = np.asarray(r)[:, :2]
            if len(rr) < 3:
                mine.append(-1)  # degenerate ring: scalar locates 0
                continue
            rid = nrings
            nrings += 1
            mine.append(rid)
            # scalar edge enumeration: (ring[i], ring[i-1]) for every i,
            # including the degenerate closing edge — parity/boundary match
            ax_l.append(rr[:, 0])
            ay_l.append(rr[:, 1])
            bx_l.append(np.roll(rr[:, 0], 1))
            by_l.append(np.roll(rr[:, 1], 1))
            ring_l.append(np.full(len(rr), rid, dtype=np.int64))
        ring_of_piece.append(mine)
    if not nrings:
        return res
    ax = np.concatenate(ax_l)
    ay = np.concatenate(ay_l)
    bx = np.concatenate(bx_l)
    by = np.concatenate(by_l)
    ring_of = np.concatenate(ring_l)
    E = len(ax)
    # a probe strictly outside a RING's bbox ± _EPS cannot be inside or on
    # that ring — its ray-cast parity over the full ring is exactly even
    # and no boundary box test can pass — so the whole ring drops for that
    # probe: build (probe, ring) candidates with a 2-D grid join, then
    # expand to the ring's edges (exact, local in both axes)
    ring_sizes = np.bincount(ring_of, minlength=nrings)
    ring_e_start = np.concatenate([[0], np.cumsum(ring_sizes)])[:-1]
    rx0 = np.full(nrings, np.inf)
    rx1 = np.full(nrings, -np.inf)
    ry0 = np.full(nrings, np.inf)
    ry1 = np.full(nrings, -np.inf)
    np.minimum.at(rx0, ring_of, np.minimum(ax, bx))
    np.maximum.at(rx1, ring_of, np.maximum(ax, bx))
    np.minimum.at(ry0, ring_of, np.minimum(ay, by))
    np.maximum.at(ry1, ring_of, np.maximum(ay, by))
    if P * nrings <= 1 << 16:
        # small case: the dense (probe, ring) product beats grid setup
        pr_p = np.repeat(np.arange(P, dtype=np.int64), nrings)
        pr_r = np.tile(np.arange(nrings, dtype=np.int64), P)
    else:
        Rbb = np.stack([rx0, ry0, rx1, ry1], 1)
        Pbb = np.stack([px, py, px, py], 1)
        pr_p, pr_r = _grid_join(Pbb, Rbb, _EPS)
        if len(pr_p):
            # dedupe (grid join may emit a pair per shared cell — duplicate
            # edges would double-count parity)
            k = np.unique(pr_p * nrings + pr_r)
            pr_p = k // nrings
            pr_r = k % nrings
    if len(pr_p):
        keep = (
            (px[pr_p] >= rx0[pr_r] - _EPS) & (px[pr_p] <= rx1[pr_r] + _EPS)
            & (py[pr_p] >= ry0[pr_r] - _EPS) & (py[pr_p] <= ry1[pr_r] + _EPS)
        )
        pr_p = pr_p[keep]
        pr_r = pr_r[keep]
    counts = ring_sizes[pr_r]
    tot = int(counts.sum())
    pp = np.repeat(pr_p, counts)
    base = np.cumsum(counts) - counts
    ee = (np.arange(tot, dtype=np.int64)
          - np.repeat(base, counts) + np.repeat(ring_e_start[pr_r], counts))
    # SPARSE per-(probe, ring) summaries — a dense P×nrings parity matrix
    # is quadratic memory on big overlays
    bnd_keys: list[np.ndarray] = []
    tog_keys: list[np.ndarray] = []
    CH = 1 << 22
    for lo in range(0, tot, CH):
        hi = min(lo + CH, tot)
        e = ee[lo:hi]
        p = pp[lo:hi]
        PX, PY = px[p], py[p]
        AX, AY, BX, BY = ax[e], ay[e], bx[e], by[e]
        cross = (BX - AX) * (PY - AY) - (BY - AY) * (PX - AX)
        sc = np.maximum(np.maximum(np.abs(BX - AX), np.abs(BY - AY)), 1.0)
        on = (
            (np.abs(cross) <= _EPS * sc * sc)
            & (PX >= np.minimum(AX, BX) - _EPS) & (PX <= np.maximum(AX, BX) + _EPS)
            & (PY >= np.minimum(AY, BY) - _EPS) & (PY <= np.maximum(AY, BY) + _EPS)
        )
        m = np.nonzero(on)[0]
        if len(m):
            bnd_keys.append(p[m] * nrings + ring_of[e[m]])
        cond = (AY > PY) != (BY > PY)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = np.where(
                cond,
                (BX - AX) * (PY - AY) / np.where(BY - AY == 0, 1, BY - AY) + AX,
                np.inf,
            )
        tog = cond & (PX < x_int)
        m = np.nonzero(tog)[0]
        if len(m):
            tog_keys.append(p[m] * nrings + ring_of[e[m]])
    bk = np.unique(np.concatenate(bnd_keys)) if bnd_keys else np.empty(0, np.int64)
    if tog_keys:
        tk, tc = np.unique(np.concatenate(tog_keys), return_counts=True)
        ik = tk[(tc & 1) == 1]  # odd crossing parity -> interior
    else:
        ik = np.empty(0, np.int64)

    def _ring_sets(keys):
        """ring id -> sorted probe indices, as a dict of slices."""
        r = keys % nrings
        p_ = keys // nrings
        o = np.argsort(r, kind="stable")
        r, p_ = r[o], p_[o]
        out = {}
        starts = np.searchsorted(r, np.arange(nrings), side="left")
        ends = np.searchsorted(r, np.arange(nrings), side="right")
        for rid in np.unique(r):
            out[int(rid)] = np.sort(p_[starts[rid]:ends[rid]])
        return out

    bnd_of = _ring_sets(bk)
    ins_of = _ring_sets(ik)
    emp = np.empty(0, np.int64)
    for mine in ring_of_piece:
        if not mine or mine[0] < 0:
            continue  # degenerate shell: the whole piece locates 0
        s = mine[0]
        sb = bnd_of.get(s, emp)
        si = ins_of.get(s, emp)
        if len(mine) == 1 or all(h < 0 for h in mine[1:]):
            res[sb] = True
            res[si] = True
            continue
        loc_pos = np.union1d(sb, si)  # shell: boundary or interior
        und = np.setdiff1d(si, sb, assume_unique=True)  # strictly inside
        for h in mine[1:]:
            if h < 0:
                continue  # degenerate hole: locates 0, never decisive
            hb = bnd_of.get(h, emp)
            hi_ = ins_of.get(h, emp)
            h1 = np.intersect1d(und, hb)
            h2 = np.intersect1d(und, np.setdiff1d(hi_, hb, assume_unique=True))
            loc_pos = np.union1d(np.setdiff1d(loc_pos, h2), h1)
            und = np.setdiff1d(und, np.union1d(hb, hi_))
        res[loc_pos] = True
    return res


def self_union(g: Geometry) -> Geometry:
    """Resolve a self-intersecting polygon into its valid even-odd region —
    the make_valid kernel for bow-ties and self-touching rings
    (reference: functions.rs:1397-1399). Self-nodes the boundary, then
    classifies with the even-odd ray cast (which is well-defined even on
    invalid rings)."""
    pa = _polygons_of(g)
    sa = _segments(pa)
    pieces = _split_at_crossings(sa, sa)
    return _classify_and_stitch(
        pieces, lambda px, py: _inside_batch(pa, px, py), g.srid, [sa])


def union_many(geoms: list[Geometry], srid: int) -> Geometry:
    """One-shot union of many polygonal pieces: node every boundary against
    every other once, classify each sub-segment against "inside ANY piece",
    stitch once — the K-ary analogue of ``overlay(..., "union")`` without
    K incremental passes over a growing accumulator (the old buffer
    bottleneck: 13 pairwise overlays per 5-vertex round-join line buffer).

    Robustness: the union area must land in [max piece, sum of pieces]
    within the noding envelope; on violation the incremental pairwise
    union (with its own snap-retry machinery) is the fallback."""
    polys = []
    for g in geoms:
        polys.extend(_polygons_of(g))
    if not polys:
        return Geometry(GeometryType.Polygon, srid=srid, rings=[])
    if len(polys) == 1:
        return Geometry(GeometryType.Polygon, srid=srid,
                        rings=[r.copy() for r in polys[0]])
    sa = _segments(polys)
    pieces = _split_at_crossings(sa, sa)
    out = _classify_and_stitch(
        pieces, lambda px, py: _inside_batch(polys, px, py), srid, [sa])
    from polars_st_spark.geo.algos import area as _area

    scale, perim = 1.0, 0.0
    for p, q in sa:
        scale = max(scale, abs(p[0]), abs(p[1]), abs(q[0]), abs(q[1]))
        perim += math.hypot(q[0] - p[0], q[1] - p[1])
    piece_areas = [
        abs(_ring_signed_area(_closed(np.asarray(rings[0])[:, :2])))
        - sum(abs(_ring_signed_area(_closed(np.asarray(r)[:, :2])))
              for r in rings[1:])
        for rings in polys
    ]
    aout = _area(out)
    env = max(1e-9, 1e-7 * scale * perim)
    if max(piece_areas) - env <= aout <= sum(piece_areas) + env:
        return out
    # envelope violated: incremental pairwise union, the robust base case
    acc = Geometry(GeometryType.Polygon, srid=srid,
                   rings=[r.copy() for r in polys[0]])
    for rings in polys[1:]:
        acc = overlay(
            acc,
            Geometry(GeometryType.Polygon, srid=srid, rings=list(rings)),
            "union",
        )
    return acc


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
    RV = _OPS_VEC[op]
    out = _classify_and_stitch(
        pieces,
        lambda px, py: RV(_inside_batch(pa, px, py), _inside_batch(pb, px, py)),
        srid, [sa, sb],
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
    """``region_fn`` takes ``(px, py)`` float arrays and returns a bool
    array — the result-region membership of each probe point (batched)."""
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

    # vectorized probe construction over every piece at once: the probe
    # distance adapts to the sub-segment length (near-tangent intersections
    # position nodes with error larger than a fixed 1e-9) but is capped at
    # 40% of the distance to the nearest other edge along the probe ray —
    # otherwise a probe wider than a sliver face lands outside it and the
    # sliver's edges are silently dropped (tests/test_overlay_adversarial.py)
    npc = len(pieces)
    if not npc:
        return Geometry(GeometryType.Polygon, srid=srid, rings=[])
    P = np.empty((npc, 2), dtype=np.float64)
    Q = np.empty((npc, 2), dtype=np.float64)
    for i, (p, q) in enumerate(pieces):
        P[i] = p[:2]
        Q[i] = q[:2]
    dvec = Q - P
    ln = np.hypot(dvec[:, 0], dvec[:, 1])
    ok = ln >= 1e-12
    ki = np.nonzero(ok)[0]
    if not len(ki):
        return Geometry(GeometryType.Polygon, srid=srid, rings=[])
    Pk, Qk = P[ki], Q[ki]
    lnk = ln[ki]
    nx = -(Qk[:, 1] - Pk[:, 1]) / lnk
    ny = (Qk[:, 0] - Pk[:, 0]) / lnk
    M = (Pk + Qk) / 2.0
    eps = np.maximum(base_eps, np.minimum(1e-4 * scale, 0.2 * lnk))
    K = len(ki)
    cap_l = np.full(K, math.inf)
    cap_r = np.full(K, math.inf)
    S = len(C)
    if S:
        # a cap only matters when 0.4*cap < eps (eps_l = min(eps, 0.4*cap))
        # — i.e. cap < 2.5*eps. The ray-hit distance |t| is >= the Chebyshev
        # distance from m to the segment's bbox, so segments farther than
        # 2.5*max(eps) from the midpoint cannot change any eps: prune the
        # product to midpoints inside each segment's dilated bbox (exact).
        delta = 2.5 * float(eps.max()) + base_eps
        sx0 = np.minimum(C[:, 0], C[:, 0] + D[:, 0])
        sx1 = np.maximum(C[:, 0], C[:, 0] + D[:, 0])
        sy0 = np.minimum(C[:, 1], C[:, 1] + D[:, 1])
        sy1 = np.maximum(C[:, 1], C[:, 1] + D[:, 1])
        Sbb = np.stack([sx0, sy0, sx1, sy1], 1)
        Mbb = np.stack([M[:, 0], M[:, 1], M[:, 0], M[:, 1]], 1)
        p_of, s_of = _grid_join(Mbb, Sbb, delta)
        okb = (
            (M[p_of, 0] >= sx0[s_of] - delta) & (M[p_of, 0] <= sx1[s_of] + delta)
            & (M[p_of, 1] >= sy0[s_of] - delta) & (M[p_of, 1] <= sy1[s_of] + delta)
        )
        p_of = p_of[okb]
        s_of = s_of[okb]
        if len(p_of):
            nxc = nx[p_of]
            nyc = ny[p_of]
            denom = nxc * D[s_of, 1] - nyc * D[s_of, 0]
            okd = np.abs(denom) > 1e-300
            dx = C[s_of, 0] - M[p_of, 0]
            dy = C[s_of, 1] - M[p_of, 1]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (dx * D[s_of, 1] - dy * D[s_of, 0]) / denom
                s = (dx * nyc - dy * nxc) / denom
            hit = okd & (s >= -1e-12) & (s <= 1.0 + 1e-12)
            pm = hit & (t > base_eps)
            nm = hit & (t < -base_eps)
            np.minimum.at(cap_l, p_of[pm], t[pm])
            np.minimum.at(cap_r, p_of[nm], -t[nm])
    eps_l = np.maximum(base_eps, np.minimum(eps, 0.4 * cap_l))
    eps_r = np.maximum(base_eps, np.minimum(eps, 0.4 * cap_r))
    lx = M[:, 0] + eps_l * nx
    ly = M[:, 1] + eps_l * ny
    rx = M[:, 0] - eps_r * nx
    ry = M[:, 1] - eps_r * ny
    both = region_fn(np.concatenate([lx, rx]), np.concatenate([ly, ry]))
    rl = both[:K]
    rr = both[K:]
    edges = []  # directed (start, end) with result-interior on the left
    for j in range(K):
        if rl[j] == rr[j]:
            continue
        i = ki[j]
        if rl[j]:
            edges.append((P[i], Q[i]))
        else:
            edges.append((Q[i], P[i]))

    return _stitch_edges(edges, srid, base_eps)


def _stitch_edges(edges, srid, base_eps):
    """Stitch directed boundary edges (result interior on the left) into
    rings and assemble the output geometry — the tail of
    ``_classify_and_stitch``, extracted unchanged (r12) so the row-batched
    buffer lane (geo/bufferrows.py) can run it per row after batched
    noding/classification."""
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
    if holes:
        # assign each hole to the smallest shell strictly containing any of
        # its first three edge midpoints — probes batched per shell (the
        # shells can be thousands of vertices; the scalar per-edge ray cast
        # was the stitch-phase hot spot)
        hpx, hpy, h_of = [], [], []
        for hi_, h in enumerate(holes):
            for j in range(min(3, len(h) - 1)):
                m = (h[j] + h[j + 1]) / 2.0
                hpx.append(m[0])
                hpy.append(m[1])
                h_of.append(hi_)
        hpx = np.asarray(hpx)
        hpy = np.asarray(hpy)
        h_of = np.asarray(h_of, dtype=np.int64)
        shell_areas = [abs(_ring_signed_area(s)) for s in shells]
        best = [(None, math.inf)] * len(holes)
        for i, s in enumerate(shells):
            strict = _ring_strict_inside_batch(s, hpx, hpy)
            if not strict.any():
                continue
            hit = np.unique(h_of[strict])
            for hh in hit:
                if shell_areas[i] < best[hh][1]:
                    best[hh] = (i, shell_areas[i])
        for hh, h in enumerate(holes):
            if best[hh][0] is not None:
                polys[best[hh][0]].append(h)
    if len(polys) == 1:
        return Geometry(GeometryType.Polygon, srid=srid, rings=polys[0])
    return Geometry(
        GeometryType.MultiPolygon,
        srid=srid,
        geoms=[Geometry(GeometryType.Polygon, srid=srid, rings=rs) for rs in polys],
    )
