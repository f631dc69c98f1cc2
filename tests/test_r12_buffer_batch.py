"""r12: row-batched line-buffer lane (geo/bufferrows.py) byte parity.

The batch lane must produce bit-identical EWKB to the per-row scalar
buffer kernel for every row it claims (and flag exactly the rows it does
not cover), over random polylines at mixed scales, collinear spikes and
revisits, closed loops (whose buffer union encloses a hole), duplicate
consecutive points, single-segment shortcut rows, long (>64-segment)
chains that exercise the grid-join candidate branch, square caps, SRID
carriers, and null / MultiLineString / degenerate routing."""

import math

import numpy as np
import pytest

from polars_st_spark.geo import algos
from polars_st_spark.geo import wkt as _wkt
from polars_st_spark.geo.bufferrows import buffer_lines_batch
from polars_st_spark.geo.wkb import from_ewkb, to_ewkb


def _scalar(b, d, qs=8, cap="flat"):
    return to_ewkb(algos.buffer(
        from_ewkb(bytes(b)), float(d), qs, cap, "round", 5.0, False))


def _line(*pts, srid=0):
    g = _wkt.from_wkt(
        "LINESTRING (" + ", ".join(f"{x!r} {y!r}" for x, y in pts) + ")")
    if srid:
        g.srid = srid
    return to_ewkb(g)


def _corpus():
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(120):
        npts = int(rng.integers(2, 9))
        sc = 10.0 ** int(rng.integers(-2, 4))
        pts = rng.uniform(-sc, sc, (npts, 2))
        d = float(10.0 ** rng.uniform(-3, 1) * sc / 10)
        cases.append((_line(*map(tuple, pts)), d))
    for i in range(12):
        x = float(i)
        # collinear spike (path doubles back on itself)
        cases.append((_line((x, 0), (x + 3, 0), (x + 1, 0)), 0.5))
        # revisit near-closure
        cases.append((_line((x, 0), (x + 2, 0), (x + 2, 2), (x, 2), (x, 0.5)), 0.3))
        # closed loop: first == last, buffer union encloses a hole
        cases.append((_line((x * 7, 0), (x * 7 + 4, 0), (x * 7 + 4, 4),
                            (x * 7, 4), (x * 7, 0)), 0.4))
        # duplicate consecutive points (degenerate segments skipped)
        cases.append((_line((x, 1), (x, 1), (x + 2, 1), (x + 2, 1), (x + 2, 3)), 0.25))
        # single segment (union_many's one-piece shortcut under flat caps)
        cases.append((_line((x, 0), (x + 1, 1)), 0.2))
    # long chain: > 64 segments per row routes the split phase through the
    # row-aware grid join instead of the dense same-row enumeration
    pts = [(j * 1.5, ((j * 13) % 7) - 3.0) for j in range(80)]
    cases.append((_line(*pts), 0.6))
    return cases


@pytest.mark.parametrize("qs,cap", [(8, "flat"), (8, "square"), (3, "flat"),
                                    (16, "square")])
def test_batch_vs_scalar_corpus(qs, cap):
    cases = _corpus()
    vals = np.array([c[0] for c in cases], dtype=object)
    dv = np.array([c[1] for c in cases])
    res = buffer_lines_batch(vals, dv, qs, cap)
    assert res is not None
    out, need = res
    n_checked = 0
    for i, (b, d) in enumerate(cases):
        if need[i]:
            continue  # caller fills with the scalar — trivially identical
        assert out[i] == _scalar(b, d, qs, cap), (qs, cap, i)
        n_checked += 1
    # the lane must actually claim the overwhelming majority of rows
    assert n_checked >= 0.8 * len(cases)


def test_b1b_shape_all_claimed():
    # the bench's exact b1b shape: every row batch-claimed, none flagged
    bufs, ds = [], []
    for i in range(500):
        x = (i % 97) + 0.5
        y = ((i * 7) % 89) + 0.5
        bufs.append(_line((x, y), (x + 4.0, y), (x + 4.0, y + 3.0)))
        ds.append(0.25 + (i % 4) * 0.25)
    vals = np.array(bufs, dtype=object)
    dv = np.array(ds)
    out, need = buffer_lines_batch(vals, dv, 8, "flat")
    assert not need.any()
    for i in range(500):
        assert out[i] == _scalar(bufs[i], ds[i])


def test_srid_uniform_batch():
    bufs = [_line((i, 0.0), (i + 5.0, 0.0), (i + 5.0, 5.0), srid=4326)
            for i in range(10)]
    vals = np.array(bufs, dtype=object)
    out, need = buffer_lines_batch(vals, np.full(10, 1.0), 8, "flat")
    for i in range(10):
        if not need[i]:
            assert out[i] == _scalar(bufs[i], 1.0)
            assert from_ewkb(bytes(out[i])).srid == 4326


def test_routing_nulls_and_flags():
    rows = np.array([
        _line((0.0, 0.0), (1.0, 0.0), (1.0, 1.0)),
        None,
        to_ewkb(_wkt.from_wkt("MULTILINESTRING ((0 0, 1 0), (2 0, 3 0))")),
        _line((0.0, 0.0), (0.0, 0.0)),       # all-degenerate
        to_ewkb(_wkt.from_wkt("LINESTRING EMPTY")),
    ], dtype=object)
    dv = np.full(5, 0.5)
    out, need = buffer_lines_batch(rows, dv, 8, "flat")
    assert not need[0] and out[0] == _scalar(rows[0], 0.5)
    assert out[1] is None and not need[1]
    assert need[2] and need[3] and need[4]


def test_mixed_srid_batch_falls_back_wholesale():
    rows = np.array([
        _line((0.0, 0.0), (1.0, 0.0)),
        _line((0.0, 0.0), (1.0, 0.0), srid=4326),
    ], dtype=object)
    assert buffer_lines_batch(rows, np.full(2, 0.5), 8, "flat") is None


def test_round_round_not_claimed():
    # round cap + round join is the scalar's exact-arc path; the lane must
    # refuse the cap style outright
    rows = np.array([_line((0.0, 0.0), (1.0, 0.0))], dtype=object)
    assert buffer_lines_batch(rows, np.full(1, 0.5), 8, "round") is None


def test_math_hypot_parity_rows():
    # rows whose segment lengths differ between math.hypot and np.hypot
    # (CPython's compensated 2-arg hypot vs libm) — the lane must use the
    # scalar's math.hypot values
    rng = np.random.default_rng(7)
    picked = []
    while len(picked) < 5:
        pts = rng.uniform(-1000, 1000, (3, 2))
        dx1, dy1 = pts[1] - pts[0]
        dx2, dy2 = pts[2] - pts[1]
        if (math.hypot(dx1, dy1) != float(np.hypot(dx1, dy1))
                or math.hypot(dx2, dy2) != float(np.hypot(dx2, dy2))):
            picked.append(pts)
    bufs = [_line(*map(tuple, p)) for p in picked]
    vals = np.array(bufs, dtype=object)
    dv = np.full(len(bufs), 1.5)
    out, need = buffer_lines_batch(vals, dv, 8, "flat")
    for i, b in enumerate(bufs):
        if not need[i]:
            assert out[i] == _scalar(b, 1.5)


def test_spark_st_buffer_lines_end_to_end(spark):
    import polars_st_spark as st
    from pyspark.sql import functions as F

    df = spark.range(0, 200).select(
        F.col("id"),
        ((F.col("id") % 97) + 0.5).cast("double").alias("x"),
        (((F.col("id") * 7) % 89) + 0.5).cast("double").alias("y"),
        (0.25 + (F.col("id") % 4) * 0.25).alias("d"),
    )
    lp = st.st_linestring(F.array(
        F.array(F.col("x"), F.col("y")),
        F.array(F.col("x") + 4.0, F.col("y")),
        F.array(F.col("x") + 4.0, F.col("y") + 3.0)))
    rows = df.select(
        "id", "d", lp.alias("g"),
        st.st_buffer(lp, "d", cap_style="flat").alias("b")).collect()
    for r in rows:
        assert bytes(r.b) == _scalar(r.g, r.d)
