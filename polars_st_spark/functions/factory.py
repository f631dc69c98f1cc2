"""Pandas-UDF factory for geometry functions.

Every ``st_*`` scalar function is an Arrow-batched vectorized pandas UDF
(JVM → Arrow → Python worker per batch), the Spark-idiomatic equivalent of
the reference's per-chunk plugin kernels (reference: geoexpr.py:35-58).

Conventions (matching the reference):
- null in → null out, elementwise (reference: src/arity.rs:56-59)
- geometry outputs are EWKB with SRID embedded (reference: functions.rs:54-58)
- SRID of the (first) geometry input is propagated to geometry outputs
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf, pandas_udf

from polars_st_spark.geo.types import Geometry
from polars_st_spark.geo.wkb import decode_batch, from_ewkb, to_ewkb
from polars_st_spark.geo.wkt import from_ewkt, from_wkt

__all__ = [
    "col_or_lit",
    "spark_dt",
    "geom_arg",
    "arrow_series_udf",
    "pa_binary_rows",
    "unary_geom",
    "unary_scalar",
    "unary_scalar_param",
    "binary_scalar",
    "binary_geom",
]


_DT_CACHE: dict = {}


def spark_dt(t):
    """Resolve a DDL type string to a DataType instance WITHOUT a session —
    pandas_udf parses string return types via the JVM, which breaks when a
    UDF builder runs inside an executor worker (the SQL registry's
    parameterized dispatch does exactly that). Unknown strings pass
    through (driver-side use only)."""
    if not isinstance(t, str):
        return t
    hit = _DT_CACHE.get(t)
    if hit is not None:
        return hit
    from pyspark.sql import types as _T

    base = {
        "binary": _T.BinaryType(), "double": _T.DoubleType(),
        "int": _T.IntegerType(), "integer": _T.IntegerType(),
        "bigint": _T.LongType(), "boolean": _T.BooleanType(),
        "string": _T.StringType(),
    }
    out = base.get(t)
    if out is None and t.startswith("array<") and t.endswith(">"):
        inner = spark_dt(t[6:-1])
        if not isinstance(inner, str):
            out = _T.ArrayType(inner)
    if out is None:
        out = t
    _DT_CACHE[t] = out
    return out


_PA_CACHE: dict = {}


def pa_dt(t):
    """DDL type string → pyarrow DataType (no session, no JVM). The r11
    arrow_udf builders construct their output arrays explicitly, so the
    exact pyarrow type must be derivable from the same strings spark_dt
    accepts. Coercion parity with the pandas_udf boundary (None rows, NaN
    scalars, NaN inside list elements, nested lists) is probe-verified in
    tests/test_r11_kernels.py::TestFactoryArrowParity."""
    hit = _PA_CACHE.get(t)
    if hit is not None:
        return hit
    import pyarrow as pa

    base = {
        "binary": pa.binary(), "double": pa.float64(),
        "int": pa.int32(), "integer": pa.int32(),
        "bigint": pa.int64(), "boolean": pa.bool_(),
        "string": pa.string(),
    }
    out = base.get(t)
    if out is None and isinstance(t, str) and t.startswith("array<") and t.endswith(">"):
        out = pa.list_(pa_dt(t[6:-1]))
    if out is None:
        raise TypeError(f"pa_dt: unsupported return type {t!r}")
    _PA_CACHE[t] = out
    return out


def _pa_in(a) -> pd.Series:
    """pyarrow array → pandas Series (the one per-batch conversion each
    arrow builder pays; the kernel bodies below are byte-identical to the
    old pandas_udf bodies)."""
    return a.to_pandas()


def arrow_series_udf(ret):
    """Decorator: wrap a pandas-Series kernel (Series in → Series out) as
    an ``arrow_udf`` (evalType 250).

    Spark's ExtractPythonUDFs only fuses adjacent Python UDFs of the SAME
    eval type; after the factory builders moved to 250, any direct
    ``@pandas_udf`` definition left at 200 forced a second ArrowEvalPython
    node — a second worker round-trip over the whole stream — into every
    projection that mixed them (measured on the b2a construct+relate chain
    at sf1: 11.8 s floor unfused vs 1.9 s + 3.4 s for the two pieces).
    Bodies stay byte-identical pandas kernels; this boundary converts once
    per batch, with the same Arrow coercions the factory builders use."""
    rt = spark_dt(ret)

    def deco(fn):
        @arrow_udf(rt)
        def udf(*arrs):
            import pyarrow as pa

            res = fn(*[a.to_pandas() for a in arrs])
            if not isinstance(res, pd.Series):
                res = pd.Series(res, dtype=object)
            return pa.Array.from_pandas(res, type=pa_dt(ret))

        return udf

    return deco


def pa_binary_rows(flat: "np.ndarray", mask=None):
    """(n, rowlen) uint8 matrix → pyarrow binary array with NO per-row
    Python objects: offsets are an arange, the value buffer is the matrix
    itself. ``mask`` (bool ndarray, True = null) sets the validity bitmap;
    null rows keep their slot bytes (valid Arrow — values under null are
    unspecified)."""
    import pyarrow as pa

    n, rowlen = flat.shape
    # int32 offsets silently wrap past 2 GiB (ADVICE r11): a user-raised
    # arrow.maxRecordsPerBatch could someday get a batch there — fail loud
    # instead of emitting a corrupt binary array
    if (n + 1) * rowlen >= 2**31:
        raise ValueError(
            f"pa_binary_rows: batch payload {n}x{rowlen} bytes overflows "
            "int32 Arrow offsets; lower spark.sql.execution.arrow."
            "maxRecordsPerBatch")
    offsets = np.arange(0, (n + 1) * rowlen, rowlen, dtype=np.int32)
    validity = None
    null_count = 0
    if mask is not None:
        mask = np.asarray(mask, dtype=bool)
        null_count = int(mask.sum())
        if null_count:
            validity = pa.py_buffer(
                np.packbits(~mask, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.binary(), n,
        [validity, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(flat).tobytes())],
        null_count=null_count)


def _pa_out(out: list, t):
    import pyarrow as pa

    return pa.Array.from_pandas(pd.Series(out, dtype=object), type=pa_dt(t))


def col_or_lit(c) -> Column:
    if isinstance(c, Column):
        return c
    if isinstance(c, str):
        return F.col(c)
    return F.lit(c)


def geom_arg(other) -> "Geometry | Column":
    """Accept a geometry 'other' argument as Column/column-name/bytes/WKT/Geometry.

    Non-Column values are decoded ONCE on the driver and broadcast via closure —
    the analogue of the reference's scalar broadcasting (src/arity.rs:63-85).
    """
    if isinstance(other, Column):
        return other
    if isinstance(other, Geometry):
        return other
    if isinstance(other, (bytes, bytearray)):
        return from_ewkb(bytes(other))
    if isinstance(other, str):
        # WKT only when the string STARTS like WKT — a geometry-type keyword
        # or an SRID= prefix (VERDICT r3 cosmetic: punctuation sniffing
        # misread a quoted column name containing a space as WKT); anything
        # else resolves as a column reference, including backtick-quoted
        # names with spaces
        import re

        if re.match(
            r"(?i)^\s*(SRID=\d+\s*;\s*)?"
            r"(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON"
            r"|GEOMETRYCOLLECTION|CIRCULARSTRING|COMPOUNDCURVE|CURVEPOLYGON"
            r"|MULTICURVE|MULTISURFACE)\s*(Z|M|ZM)?\s*(\(|EMPTY)",
            other,
        ):
            return from_ewkt(other)
        return F.col(other)
    raise TypeError(f"Cannot interpret {type(other).__name__} as geometry")


def _decode(b) -> Geometry | None:
    if b is None:
        return None
    return from_ewkb(bytes(b))


def _encode(g: Geometry | None) -> bytes | None:
    if g is None:
        return None
    return to_ewkb(g)


def unary_geom(fn: Callable[[Geometry], Geometry], name: str = "st_fn"):
    """geometry → geometry column (EWKB in, EWKB out, null-safe).

    r11: all factory builders are ``arrow_udf`` (evalType 250) so they
    fuse with the zero-copy hot-kernel UDFs into ONE ArrowEvalPython node
    per projection — a mixed 200/250 projection pays a second Python
    round-trip over the whole stream. Bodies are unchanged."""

    @arrow_udf(spark_dt("binary"))
    def udf(a):
        s = _pa_in(a)
        return _pa_out(
            [None if g is None else _encode(fn(g)) for g in decode_batch(s)],
            "binary",
        )

    return udf


def unary_scalar(fn: Callable[[Geometry], Any], return_type: str, name: str = "st_fn"):
    """geometry → scalar column. None passthrough; fn errors propagate."""

    @arrow_udf(spark_dt(return_type))
    def udf(a):
        s = _pa_in(a)
        out = [None if g is None else fn(g) for g in decode_batch(s)]
        return _pa_out(out, return_type)

    return udf


def unary_scalar_param(
    fn: Callable[[Geometry, Any], Any],
    return_type: str,
    param,
    name: str = "st_fn",
):
    """geometry + numeric parameter → scalar column, with the reference's
    broadcastable-Expr parameter semantics (src/arity.rs:63-85): a Python
    scalar closes over the kernel (single-column UDF, vectorized fast paths
    untouched), while a Column / column name zips a per-row parameter series
    against the geometry batch. Null or NaN in either input → null out."""
    if not isinstance(param, (Column, str)):

        def single(col) -> Column:
            return unary_scalar(lambda g: fn(g, param), return_type, name)(col_or_lit(col))

        return single

    p = col_or_lit(param)

    @arrow_udf(spark_dt(return_type))
    def udf(a, av):
        s, v = _pa_in(a), _pa_in(av)
        out = [
            None if g is None or pd.isna(x) else fn(g, x)
            for g, x in zip(decode_batch(s), v)
        ]
        return _pa_out(out, return_type)

    def paired(col) -> Column:
        return udf(col_or_lit(col), p)

    return paired


def binary_scalar(
    fn: Callable[[Geometry, Geometry], Any],
    return_type: str,
    other,
    name: str = "st_fn",
):
    """(geometry, geometry) → scalar. ``other`` may be a Column or a constant
    geometry (broadcast, decoded once)."""
    if isinstance(other, Geometry):
        g2 = other

        @arrow_udf(spark_dt(return_type))
        def udf(a):
            s = _pa_in(a)
            out = [None if g is None else fn(g, g2) for g in decode_batch(s)]
            return _pa_out(out, return_type)

        return udf, None

    @arrow_udf(spark_dt(return_type))
    def udf2(a1, a2):
        s1, s2 = _pa_in(a1), _pa_in(a2)
        out = [
            None if (g1 is None or g2 is None) else fn(g1, g2)
            for g1, g2 in zip(decode_batch(s1), decode_batch(s2))
        ]
        return _pa_out(out, return_type)

    # other=None: return the bare two-column UDF (SQL registry; the caller
    # applies it to both sides itself — no driver Column is built, so this
    # path is safe inside executor workers)
    return udf2, (col_or_lit(other) if other is not None else None)


def binary_geom(
    fn: Callable[[Geometry, Geometry], Geometry],
    other,
    name: str = "st_fn",
):
    """(geometry, geometry) → geometry."""
    if isinstance(other, Geometry):
        g2 = other

        @arrow_udf(spark_dt("binary"))
        def udf(a):
            s = _pa_in(a)
            return _pa_out(
                [None if g is None else _encode(fn(g, g2)) for g in decode_batch(s)],
                "binary",
            )

        return udf, None

    @arrow_udf(spark_dt("binary"))
    def udf2(a1, a2):
        s1, s2 = _pa_in(a1), _pa_in(a2)
        out = [
            None if (g1 is None or g2 is None) else _encode(fn(g1, g2))
            for g1, g2 in zip(decode_batch(s1), decode_batch(s2))
        ]
        return _pa_out(out, "binary")

    return udf2, (col_or_lit(other) if other is not None else None)
