"""Mixed-argument Python-UDF chain collapse (r12; guide §4.3, VERDICT r11
item 3).

Spark's ExtractPythonUDFs collapses chained Python UDFs ``f(g(x))`` into
one ArrowEvalPython node ONLY for pure chains; a mixed-argument call
``f(col, g(x))`` always plans as TWO nodes (verified on Spark 4.1.2) — the
whole stream crosses the JVM↔Python boundary twice and ``g``'s output is
serialized back to the JVM just to be re-sent to ``f``. Measured on the
b2a construct+relate chain at sf1: ~4 s for the chain when the two pieces
cost ~1.3 s + the relate pass (OPTIMIZATION_r11.md change 8).

When both ends are library-owned we can do what the planner cannot:
evaluate ``g`` inside ``f``'s worker pass. Every tagged geometry-producing
``st_*`` Column carries ``_pst_fuse = (arrow_fn, input_cols)`` where
``arrow_fn`` is the SAME ``(pa.Array, ...) -> pa.Array`` kernel the UDF
itself runs and ``input_cols`` are the Columns it was applied to.
Consumers (predicates, relate, dwithin, distance) detect the tag and build
ONE ``arrow_udf`` over the flat input columns that calls ``arrow_fn``
inline and feeds its output to the consumer's own arrow evaluation body
(``consumer_udf.func``). Results are byte-identical by construction — the
same kernels see the same bytes and the same nulls; only the number of
boundary crossings changes (plan: 2+ ArrowEvalPython → 1).

Tags ride on the Column object, so they survive only direct composition
(``st_relate(col, st_rectangle(...))``); anything that rebuilds the Column
(``.alias``, a select boundary, SQL) silently falls back to the unfused
plan — correctness never depends on a tag being seen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql.functions import arrow_udf

from polars_st_spark.functions.factory import spark_dt

__all__ = ["tag", "tagged", "fuse_info", "apply_pair", "apply_unary"]

# Bound the fused UDF's flattened signature: pathological nesting (deeply
# composed constructors) falls back to the planner's two-node shape
# instead of building an unboundedly wide projection.
MAX_FUSE_COLS = 8


def tag(col: Column, udf_obj, inputs) -> Column:
    """Attach the fusion descriptor to a UDF-result Column; best-effort
    (a Column implementation without settable attributes stays untagged
    and everything still works through the normal plan)."""
    fn = getattr(udf_obj, "func", None)
    if fn is not None:
        try:
            col._pst_fuse = (fn, tuple(inputs))
        except Exception:
            pass
    return col


def tagged(udf_obj, *cols) -> Column:
    """Apply ``udf_obj`` to ``cols`` and tag the result."""
    return tag(udf_obj(*cols), udf_obj, cols)


def fuse_info(col):
    if isinstance(col, Column):
        t = getattr(col, "_pst_fuse", None)
        if (
            isinstance(t, tuple)
            and len(t) == 2
            and callable(t[0])
            and all(isinstance(c, Column) for c in t[1])
        ):
            return t
    return None


def _expand(col):
    """Column → (flat input Columns, feed) where ``feed(arrs, i)`` consumes
    the arg slice starting at ``i`` and returns (pa.Array, next_i).
    Untagged columns pass through; tagged ones recurse into their inputs."""
    info = fuse_info(col)
    if info is None:
        def feed_plain(arrs, i):
            return arrs[i], i + 1

        return [col], feed_plain
    fn, inputs = info
    subs = [_expand(c) for c in inputs]
    # capture only the sub-feed callables: Column objects hold py4j JVM
    # refs and must never enter the UDF closure (unpicklable)
    sub_feeds = [f for _, f in subs]

    def feed(arrs, i):
        vals = []
        for f in sub_feeds:
            v, i = f(arrs, i)
            vals.append(v)
        return fn(*vals), i

    return [c for cs, _ in subs for c in cs], feed


def apply_pair(consumer_udf, ret, a, b):
    """Fused ``consumer_udf(a, b)`` when at least one side carries a tag;
    None when no tag is visible (caller uses its normal plan). ``ret`` is
    the consumer's DDL return type string."""
    if fuse_info(a) is None and fuse_info(b) is None:
        return None
    ca, fa = _expand(a)
    cb, fb = _expand(b)
    if len(ca) + len(cb) > MAX_FUSE_COLS:
        return None
    ev = consumer_udf.func

    @arrow_udf(spark_dt(ret))
    def fused(*arrs):
        va, i = fa(arrs, 0)
        vb, _ = fb(arrs, i)
        return ev(va, vb)

    return fused(*(ca + cb))


def apply_unary(consumer_udf, ret, a):
    """Fused ``consumer_udf(a)`` when ``a`` carries a tag, else None."""
    if fuse_info(a) is None:
        return None
    ca, fa = _expand(a)
    if len(ca) > MAX_FUSE_COLS:
        return None
    ev = consumer_udf.func

    @arrow_udf(spark_dt(ret))
    def fused(*arrs):
        va, _ = fa(arrs, 0)
        return ev(va)

    return fused(*ca)
