"""Worker arena retention/prewarm: gating and tunables (the perf effect
itself is measured in bench.py; here we pin the contract — driver processes
skip, worker-context imports set malloc retention thresholds, the eager
page touch is OFF by default (r7: 256 MiB x 32 concurrently-forking workers
cost 74.5s/task of Python-worker init on a lazily-backed host) and both
knobs disable cleanly via env)."""

from __future__ import annotations

import os
import sys

import polars_st_spark as st


def test_prewarm_skips_outside_worker():
    # this test process is a driver: pyspark.worker is not in sys.modules,
    # so calling the hook must be a cheap no-op (no mallopt, no allocation)
    assert "pyspark.worker" not in sys.modules
    st._maybe_prewarm_worker_arena()  # returns without side effects


def test_prewarm_runs_in_worker_context():
    # in a SUBPROCESS: the hook calls mallopt, which cannot be undone and
    # would lower this pytest process's mmap/trim thresholds for every
    # later test (exactly the fault-churn pathology the retention prevents)
    import subprocess

    code = (
        "import sys; sys.modules['pyspark.worker'] = sys\n"
        "import resource, polars_st_spark as st\n"  # import-time hook fires
        "st._maybe_prewarm_worker_arena()\n"  # idempotent when called again
        "print('prewarm-ok')\n"
    )
    # default: retention thresholds only, no eager touch — worker import
    # must stay cheap (RSS well under the old 256 MiB touch)
    # bare import is ~126 MB; the (off-by-default) 256 MiB touch would push
    # it past ~380 MB — 240 separates the two with margin for ambient
    # loader variance under a fully loaded test host
    code_rss = code + (
        "rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024\n"
        "assert rss_mb < 240, f'eager touch ran by default: {rss_mb} MB'\n"
        "print('rss-ok')\n"
    )
    r = subprocess.run([sys.executable, "-c", code_rss], capture_output=True,
                       text=True, env=dict(os.environ), timeout=120)
    assert r.returncode == 0, r.stderr
    assert "prewarm-ok" in r.stdout and "rss-ok" in r.stdout
    # opt-in eager touch still works (long-lived fixed-worker deployments)
    env = dict(os.environ, POLARS_ST_SPARK_PREWARM_MB="2")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "prewarm-ok" in r.stdout


def test_prewarm_env_disable(monkeypatch):
    # MALLOC_THRESH_MB=0 skips mallopt and PREWARM_MB<=0 skips the touch,
    # so calling the hook in a fake worker context is safe in-process
    monkeypatch.setitem(sys.modules, "pyspark.worker", sys)
    monkeypatch.setenv("POLARS_ST_SPARK_MALLOC_THRESH_MB", "0")
    monkeypatch.setenv("POLARS_ST_SPARK_PREWARM_MB", "0")
    st._maybe_prewarm_worker_arena()  # fully disabled: no-op
    monkeypatch.setenv("POLARS_ST_SPARK_PREWARM_MB", "-5")
    st._maybe_prewarm_worker_arena()  # negative: no-op
