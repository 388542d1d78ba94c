#!/usr/bin/env python
"""Multi-file fact layout at sf10 (round-11 brief item 4).

The residual q01/q03/q05 gap vs DuckDB at sf10 was attributed (r9/r10
per-stage tables) to the pruned single-file 60M-row lineitem scan: the
fact table is ONE parquet file, which DuckDB reads with row-group
parallelism while Spark's split planning only matches it at 32m
``maxPartitionBytes`` (worth 15-25 % in AB_Q3Q5Q18_r10.json, not
adopted).  Every real 100 TB table is MANY files — so this script
tests the claim directly:

* builds ``<sf10>/../sf10_mf`` with lineitem rewritten as 32 parquet
  files (same rows, same schema; all other tables symlinked),
* measures q01/q03/q05 on {single-file, multi-file} x
  {default 128m, 32m} ``spark.sql.files.maxPartitionBytes`` —
  interleaved, one session, min of BENCH_RUNS after warm-up,
* pairs DuckDB back-to-back on its own (single-file) layout.

Decision rule: if multi-file @ default ~= single-file @ 32m, the knob
is a single-file-only workaround and the right SHIP decision is the
layout note (write facts as many files — writers already do) rather
than a global conf change; if multi-file still wants 32m, ship the
conf.  Emits MULTIFILE_SF10_r11.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10"
MF = SF.rstrip("/") + "_mf"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "MULTIFILE_SF10_r11.json")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
QUERIES = ["q01_pricing_summary", "q03_top_orders", "q05_region_revenue"]
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def build_mf(spark) -> None:
    if os.path.exists(f"{MF}/lineitem.parquet/_SUCCESS"):
        return
    os.makedirs(MF, exist_ok=True)
    for t in TABLES:
        if t == "lineitem":
            continue
        dst = f"{MF}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF}/{t}.parquet", dst)
    (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{MF}/lineitem.parquet")
    )


def time_q(spark, name, sf_dir):
    fn = workload.QUERIES[name]
    fn(spark, sf_dir).toPandas()  # warm-up
    ts = []
    for _ in range(RUNS):
        t0 = time.time()
        fn(spark, sf_dir).toPandas()
        ts.append(round(time.time() - t0, 3))
    return min(ts), ts


def main() -> None:
    out: dict = {
        "metric": "multifile_fact_sf10", "sf": 10.0, "runs": RUNS,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "physical_cores": os.cpu_count(),
        "grid": {},
    }
    spark = build_session(
        app_name="multifile_r11", master="local[32]", shuffle_partitions=32
    )
    build_mf(spark)
    grid = [
        ("single_128m", SF, 128 << 20),
        ("single_32m", SF, 32 << 20),
        ("multi_128m", MF, 128 << 20),
        ("multi_32m", MF, 32 << 20),
    ]
    for rnd in range(1):  # grid interleaves internally per query
        for name in QUERIES:
            for label, sf_dir, mpb in grid:
                spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
                best, ts = time_q(spark, name, sf_dir)
                out["grid"].setdefault(name, {})[label] = {"sec": best, "runs": ts}
                print(name, label, ts, flush=True)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    spark.stop()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    out["duckdb"] = {}
    for name in QUERIES:
        sql = workload.ORACLE_SQL[name]
        con.sql(sql).fetchall()
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            con.sql(sql).fetchall()
            ts.append(round(time.time() - t0, 3))
        out["duckdb"][name] = min(ts)
        print(name, "duck", ts, flush=True)
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    out["noisy_window"] = bool(out["loadavg_start"][0] > (os.cpu_count() or 1) / 8)
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    summary = {
        name: {lab: v["sec"] for lab, v in grid_v.items()}
        for name, grid_v in out["grid"].items()
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
