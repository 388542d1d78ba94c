#!/usr/bin/env python
"""sf10 q-series knob session (round-8 brief item 2, deferred from r6/r7).

q01/q03/q05 at sf10 sit 10-17x over DuckDB (0.4-0.7 s absolute) on
single-pass scan-agg shapes.  Hypothesis to test, in falsifiable form:

1. **Scan parallelism**: sf10 lineitem is ONE 1.84 GB parquet file;
   at the default ``spark.sql.files.maxPartitionBytes=128m`` the scan
   yields ~14 input splits for 32 cores — more than half the box idles
   during the dominant stage.  A/B 128m vs 64m vs 32m vs 16m.
   (At the 100 TB design point this knob is irrelevant — a real corpus
   is thousands of files and every core saturates; this is exactly the
   "one box, one file" residual the brief asks to quantify.)
2. **Shuffle width**: q03/q05 carry a 60 M-row SMJ shuffle;
   A/B shuffle.partitions 32 vs 64 vs 128 at the best scan split.

Protocol: one session, per-combo min of 3 after warm-up (BASELINE.md
capability-floor rule), trials interleaved per query so machine drift
hits all combos equally.  Emits one JSON line + AB_SF10_r08.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbigdata_spark import workload
from etlbigdata_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfscale/sf10")
QUERIES = ["q01_pricing_summary", "q03_top_orders", "q05_region_revenue"]
RUNS = 3


def time_once(spark, name):
    t0 = time.perf_counter()
    workload.QUERIES[name](spark, SF_DIR).toPandas()
    return time.perf_counter() - t0


def main() -> None:
    spark = build_session(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    results: dict = {"sf_dir": SF_DIR, "runs": RUNS, "combos": {}}

    # warm-up (JVM + page cache) once per query
    for q in QUERIES:
        time_once(spark, q)

    # phase 1: scan-split sweep at shuffle=32
    split_combos = ["134217728", "67108864", "33554432", "16777216"]
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    for q in QUERIES:
        for _ in range(RUNS):
            for mpb in split_combos:
                spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
                key = f"{q}|mpb={int(mpb)//(1<<20)}m|sp=32"
                t = time_once(spark, q)
                results["combos"].setdefault(key, []).append(round(t, 3))

    # pick best split per query for phase 2
    best_mpb: dict[str, str] = {}
    for q in QUERIES:
        best = min(
            split_combos,
            key=lambda m: min(results["combos"][f"{q}|mpb={int(m)//(1<<20)}m|sp=32"]),
        )
        best_mpb[q] = best

    # phase 2: shuffle-width sweep at each query's best split.  sp=32
    # is NOT re-run — its phase-1 samples at the same mpb are the
    # comparison point, keeping every combo at the same sample count
    # (review fix: re-running it made sp=32 a min-of-6 vs min-of-3)
    for q in QUERIES:
        spark.conf.set("spark.sql.files.maxPartitionBytes", best_mpb[q])
        for _ in range(RUNS):
            for sp in ("64", "128"):
                spark.conf.set("spark.sql.shuffle.partitions", sp)
                key = f"{q}|mpb={int(best_mpb[q])//(1<<20)}m|sp={sp}"
                t = time_once(spark, q)
                results["combos"].setdefault(key, []).append(round(t, 3))
        spark.conf.set("spark.sql.shuffle.partitions", "32")

    results["min_per_combo"] = {k: min(v) for k, v in results["combos"].items()}
    results["best_mpb"] = {q: f"{int(m)//(1<<20)}m" for q, m in best_mpb.items()}
    line = json.dumps(results)
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "AB_SF10_r08.json"), "w"
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
