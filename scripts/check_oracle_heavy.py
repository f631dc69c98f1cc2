"""Heavy-gate oracle check at ramp scale (VERDICT r7 item 7): replay the
driver's correctness compare for selected gates against a scale_data dir
that only carries the tables those gates read (make_scale_data.py derives
lineitem/customer/documents/... but not part/orders/events).

Usage: python scripts/check_oracle_heavy.py [sf_dir] [query ...]
Defaults: scale_data/sf1, queries adjacency_relate sjoin_touches.
Writes nothing; prints the same ok/FAIL lines as check_oracle.py.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

import __spark_entry__ as entry_mod  # noqa: E402
from check_oracle import TABLES, rows_key  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_ROOT, "scale_data", "sf1")
    names = sys.argv[2:] or ["adjacency_relate", "sjoin_touches"]
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("oracle-heavy")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if not os.path.exists(p):
            continue
        # make_scale_data.py writes Spark-style parquet DIRECTORIES
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}", flush=True)
            failures.append(name)
            continue
        t_spark = time.time() - t0
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:300]}", flush=True)
            failures.append(name)
            continue
        t_duck = time.time() - t0
        ok = sorted(scols) == sorted(dcols) and len(srows) == len(drows)
        if ok:
            ok = rows_key(scols, srows) == rows_key(dcols, drows)
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: spark {len(srows)} rows in {t_spark:.1f}s, "
              f"oracle {len(drows)} rows in {t_duck:.1f}s"
              + ("" if ok else " — MISMATCH"), flush=True)
        if not ok:
            failures.append(name)
    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("ALL MATCH")
    spark.stop()


if __name__ == "__main__":
    main()
