"""Worker arena prewarm: gating and tunables (the perf effect itself is
measured in bench.py; here we pin the contract — driver processes skip,
worker-context imports touch the arena, env disables cleanly)."""

from __future__ import annotations

import os
import sys

import polars_st_spark as st


def test_prewarm_skips_outside_worker():
    # this test process is a driver: pyspark.worker is not in sys.modules,
    # so calling the hook must be a cheap no-op (no multi-hundred-MB RSS)
    assert "pyspark.worker" not in sys.modules
    st._maybe_prewarm_worker_arena()  # returns without allocating


def test_prewarm_runs_in_worker_context(monkeypatch):
    monkeypatch.setitem(sys.modules, "pyspark.worker", sys)  # sentinel
    monkeypatch.setenv("POLARS_ST_SPARK_PREWARM_MB", "2")
    st._maybe_prewarm_worker_arena()  # 2 MiB touch, must not raise


def test_prewarm_env_disable(monkeypatch):
    monkeypatch.setitem(sys.modules, "pyspark.worker", sys)
    monkeypatch.setenv("POLARS_ST_SPARK_PREWARM_MB", "0")
    st._maybe_prewarm_worker_arena()  # disabled: no-op
    monkeypatch.setenv("POLARS_ST_SPARK_PREWARM_MB", "-5")
    st._maybe_prewarm_worker_arena()  # negative: no-op
