#!/usr/bin/env python
"""Local replica of the driver's correctness gate at an arbitrary SF.

Runs every __spark_entry__.queries() entry AND its oracle_sql() on the
same parquet tables, compares row counts + sorted canonical values, and
prints one status line per entry plus a summary.

Usage:  python scripts/gate_check.py [sf_dir] [cpus]
"""

from __future__ import annotations

import math
import os
import sys
import time

# runnable from any cwd: the repo root (parent of scripts/) hosts
# __spark_entry__ and the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "8"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("gate-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = {s for s in os.environ.get("GATE_ONLY", "").split(",") if s}
    if only:
        unknown = only - set(queries)
        if unknown:
            raise SystemExit(
                f"GATE_ONLY names not in queries(): {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in only}
    failures = []
    timings = {}
    # walk in queries() dict order — the same order the driver stamps
    # under its runtime budget — so per-entry seconds map onto the
    # driver's cutoff directly
    for name in queries:
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(canon(r[c]) for c in cols) for r in sdf.collect())
            if name not in oracles:
                timings[name] = time.perf_counter() - t0
                print(f"{name:24s} rows={len(srows):6d}  (no oracle)"
                      f"  {timings[name]:6.2f}s")
                continue
            t_spark = time.perf_counter() - t0
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            order = sorted(range(len(ocols)), key=lambda i: ocols[i])
            orows = sorted(
                tuple(canon(r[i]) for i in order) for r in cur.fetchall())
            ok = srows == orows
            timings[name] = time.perf_counter() - t0
            print(f"{name:24s} spark={len(srows):6d} oracle={len(orows):6d} "
                  f"{'OK' if ok else 'MISMATCH'}  {timings[name]:6.2f}s"
                  f" (spark {t_spark:5.2f}s / oracle"
                  f" {timings[name] - t_spark:5.2f}s)")
            if not ok:
                failures.append(name)
                shown = 0
                for a, b in zip(srows, orows):
                    if a != b and shown < 3:
                        print(f"    spark : {a}\n    oracle: {b}")
                        shown += 1
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append(name)
            timings[name] = time.perf_counter() - t0
            print(f"{name:24s} ERROR: {exc}")
    total = sum(timings.values())
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print(f"\ntotal {total:.1f}s; slowest: "
          + ", ".join(f"{n}={s:.1f}s" for n, s in slow))
    print(f"{len(queries) - len(failures)}/{len(queries)} green"
          + (f"; failing: {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
