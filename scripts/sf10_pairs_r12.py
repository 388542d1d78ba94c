#!/usr/bin/env python
"""sf10 16-query same-session Spark/DuckDB pair under ROUND-12 code and
protocol (round-12 brief items 2+3).

What changed since BENCH_sf10_r11.json, all of which this pair records:

* **Layout** — the default sf_dir is the order-preserving MULTI-FILE
  fixture (/tmp/scaled/sf10o, built by make_multifile_fixtures_r12.py
  per MULTIFILE_SF10_r11.json's ship rule); BOTH engines read the
  identical multi-file bytes (benchutil registers directory layouts as
  globs).  Pass the old single-file dir to reproduce the r11 straw man.
* **Fetch protocol** — matched Arrow destinations on both engines
  (Spark ``toArrow`` / duckdb ``.arrow()``), replacing the mismatched
  toPandas-vs-fetchall pairing that dominated multi-million-row
  results (BASELINE.md round-12 protocol note, EVT03_DECOMP_r12.json).
* **evt03** — the narrow fixed-point row rewrite (workload.py).

Protocol otherwise = the r9/r11 artifact's: one Spark session,
per-query min of BENCH_RUNS (default 2) after one warm-up, light
queries first, the two heavy dedup rows (d02, d08) last; DuckDB
back-to-back in the same process on the identical oracle SQL; bench.py
noise stamps (loadavg start/end, floor probe + end-of-run re-probe,
benchutil.noisy_start).

Usage: python scripts/sf10_pairs_r12.py [sf_dir] [out_json]
Defaults: /tmp/scaled/sf10o  BENCH_sf10_r12.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.benchutil import noisy_start, register_duck_views  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402

LIGHT = [
    "q01_pricing_summary", "q03_top_orders", "q05_region_revenue",
    "q07_nation_volume", "q18_large_orders", "q21_sole_failing_supplier",
    "b07_topk_group", "b10_running_sum", "evt03_sessionize",
    "t01_text_stats", "t02_token_count", "d01_dup_groups",
    "t14_surprisal", "s01_cosine_topk",
]
HEAVY = ["d02_jaccard_pairs", "d08_containment_pairs"]
SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10o"
OUT = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf10_r12.json"
RUNS = int(os.environ.get("BENCH_RUNS", "2"))


def measure_floor(spark) -> float:
    fn = lambda: workload.load(spark, SF, "region").limit(1).toArrow()  # noqa: E731
    for _ in range(3):
        fn()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)


def main() -> None:
    load_start = os.getloadavg()
    out: dict = {
        "metric": "sf10_16query_pair", "sf": 10.0, "runs": RUNS,
        "sf_dir": SF,
        "loadavg_start": [round(x, 2) for x in load_start],
        "logical_cpus": os.cpu_count(),
        "spark": {}, "duckdb": {},
    }
    spark = build_session(
        app_name="sf10_pairs_r12", master="local[32]", shuffle_partitions=32
    )
    floor = measure_floor(spark)
    out["floor_sec"] = floor
    for name in LIGHT + HEAVY:
        fn = workload.QUERIES[name]
        fn(spark, SF).toArrow()  # warm-up: plan, codegen, IO cache
        ts = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).toArrow()
            ts.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        out["spark"][name] = min(ts)
        print(name, "spark", ts, flush=True)
    floor_end = measure_floor(spark)
    out["floor_end_sec"] = floor_end
    out["floor_drift"] = round(floor_end / floor, 2) if floor > 0 else None
    spark.stop()

    con = duckdb.connect()
    register_duck_views(con, SF)
    for name in LIGHT + HEAVY:
        sql = workload.ORACLE_SQL[name]
        con.sql(sql).arrow()
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            con.sql(sql).arrow()
            ts.append(round(time.time() - t0, 3))
        out["duckdb"][name] = min(ts)
        print(name, "duck", ts, flush=True)

    out["spark_total"] = round(sum(out["spark"].values()), 2)
    out["duck_total"] = round(sum(out["duckdb"].values()), 2)
    out["ratio"] = round(out["spark_total"] / out["duck_total"], 3)
    out["ratios"] = {
        k: round(out["spark"][k] / out["duckdb"][k], 2) for k in out["spark"]
    }
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    out["noisy_window"] = bool(
        (out["floor_drift"] is not None and out["floor_drift"] > 1.5)
        or noisy_start(load_start)
    )
    out["protocol_note"] = (
        "single session, light-14 then heavy-2, min of BENCH_RUNS=%d after "
        "warm-up; round-12 code (evt03 narrow fixed-point row) + protocol "
        "(matched Arrow fetch on both engines) + order-preserving "
        "multi-file fact layout on both engines; bench.py noise rule "
        "(floor drift + benchutil.noisy_start)" % RUNS
    )
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps({"ratio": out["ratio"], "noisy": out["noisy_window"]}))


if __name__ == "__main__":
    main()
