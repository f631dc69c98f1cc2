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


def test_prewarm_runs_in_worker_context():
    # in a SUBPROCESS: the prewarm calls mallopt, which cannot be undone
    # and would lower this pytest process's mmap/trim thresholds for every
    # later test (exactly the fault-churn pathology the prewarm prevents)
    import subprocess

    code = (
        "import sys; sys.modules['pyspark.worker'] = sys\n"
        "import polars_st_spark as st\n"   # import-time hook fires here
        "st._maybe_prewarm_worker_arena()\n"  # and is idempotent when called again
        "print('prewarm-ok')\n"
    )
    env = dict(os.environ, POLARS_ST_SPARK_PREWARM_MB="2")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "prewarm-ok" in r.stdout


def test_prewarm_env_disable(monkeypatch):
    # mb <= 0 returns BEFORE the mallopt calls, so this is safe in-process
    monkeypatch.setitem(sys.modules, "pyspark.worker", sys)
    monkeypatch.setenv("POLARS_ST_SPARK_PREWARM_MB", "0")
    st._maybe_prewarm_worker_arena()  # disabled: no-op
    monkeypatch.setenv("POLARS_ST_SPARK_PREWARM_MB", "-5")
    st._maybe_prewarm_worker_arena()  # negative: no-op
