"""polars-st-spark: a PySpark-native spatial analytics engine.

A from-scratch PySpark library providing the query and data-processing
capabilities of the polars-st reference (PostGIS-style ``ST_*`` operations
over DataFrame columns), re-expressed Spark-first:

- geometry = EWKB bytes in ordinary ``BinaryType`` columns (per-value SRID,
  reference semantics: ``/root/reference/README.md:36``, ``src/wkb.rs:23-27``)
- scalar ops = Arrow-batched pandas UDFs over a numpy-vectorized geometry
  kernel (this repo's own; no GEOS/shapely dependency)
- aggregations = GROUPED_AGG pandas UDFs / plain Spark SQL where possible
- spatial join = broadcast STRtree or grid-cell equi-join
- everything composes with normal Spark SQL (Catalyst optimizes around it)
"""

def _maybe_prewarm_worker_arena() -> None:
    """One-time malloc-arena prewarm inside PySpark worker processes.

    On virtualized hosts, first-touch minor faults on fresh anonymous pages
    can cost ~50-100x their steady-state price (hypervisor-backed memory).
    Measured here: a batch kernel's first large call per worker spent
    2.3-3.0s of SYSTEM time on ~41k minor faults (~60us each) while the
    same call costs 0.45s warm — a 600k-row relate sweep ran 13.2s cold vs
    3.1s prewarmed, and the identical pattern produced the historical
    first-shot spreads in b1/p6. Touching the arena once at import — and
    raising M_TRIM_THRESHOLD / M_MMAP_THRESHOLD so glibc serves large numpy
    temporaries from the retained arena instead of fresh mmaps — moves the
    fault cost into worker startup, where a session's warmup pass absorbs
    it. Runs in PySpark workers only (they import ``pyspark.worker`` before
    unpickling UDF closures); drivers and plain library users skip it.
    Tunable via ``POLARS_ST_SPARK_PREWARM_MB`` (default 256; 0 disables)."""
    import os
    import sys

    if "pyspark.worker" not in sys.modules:
        return
    try:
        mb = int(os.environ.get("POLARS_ST_SPARK_PREWARM_MB", "256"))
    except ValueError:
        mb = 256
    if mb <= 0:
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        # Thresholds STRICTLY ABOVE the prewarm allocation (2x), so the
        # probe is served from the brk arena (below M_MMAP_THRESHOLD —
        # an mmap'd probe would be munmapped on free and the host would
        # reclaim the pages) and the freed top chunk stays below
        # M_TRIM_THRESHOLD (so glibc RETAINS it for the kernels' later
        # temporaries — the entire point of the prewarm).
        # mallopt takes C ints: clamp so PREWARM_MB >= 1024 can't overflow
        # (ctypes would raise, the except would swallow it, and the
        # retention thresholds would silently stay at defaults).
        libc.mallopt.argtypes = (ctypes.c_int, ctypes.c_int)
        thresh = min(2 * mb * 1024 * 1024, 2**31 - 1)
        libc.mallopt(-1, thresh)  # M_TRIM_THRESHOLD
        libc.mallopt(-3, thresh)  # M_MMAP_THRESHOLD
    except Exception:
        pass  # non-glibc platform: plain touch still warms the allocator
    import numpy as _np

    buf = _np.empty(mb * 131072, dtype=_np.float64)  # mb MiB
    buf[::512] = 1.0  # one write per 4 KiB page
    del buf


_maybe_prewarm_worker_arena()

from polars_st_spark.frame import (
    geodataframe,
    geom,
    plot,
    sjoin,
    to_ewkt,
    to_feature_dicts,
    to_geojson,
    to_wkb,
    to_wkt,
)
from polars_st_spark.operators.predjoin import filter_pairs
from polars_st_spark.functions import *  # noqa: F401,F403
from polars_st_spark.functions import __all__ as _fn_all

__version__ = "0.1.0"
__all__ = list(_fn_all) + [
    "geodataframe", "geom", "plot", "sjoin", "to_feature_dicts", "filter_pairs",
]
