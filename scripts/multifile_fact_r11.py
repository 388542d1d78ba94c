#!/usr/bin/env python
"""Multi-file fact layout at sf10 (round-11 brief item 4).

The residual q01/q03/q05 gap vs DuckDB at sf10 was attributed (r9/r10
per-stage tables) to the pruned single-file 60M-row lineitem scan: the
fact table is ONE parquet file, which DuckDB reads with row-group
parallelism while Spark's split planning only matches it at 32m
``maxPartitionBytes`` (worth 15-25 % in AB_Q3Q5Q18_r10.json, not
adopted).  Every real 100 TB table is MANY files — so this script
tests the claim directly:

* builds TWO multi-file lineitem layouts: ``sf10_mf`` =
  ``repartition(32)`` (random row order — the straw man: it destroys
  the source's natural orderkey clustering) and ``sf10_mfo`` =
  ORDER-PRESERVING split (read at 48m splits, one file per input
  split — how a real pipeline's writer lands a big table); all other
  tables symlinked,
* measures q01/q03/q05 on {single, multi-random, multi-ordered} x
  {default 128m, 32m} ``spark.sql.files.maxPartitionBytes`` —
  interleaved per query, one session, min of BENCH_RUNS after warm-up,
* pairs DuckDB back-to-back on its own (single-file) layout.

Decision rule: if multi-ordered @ default ~= the best single-file
setting (or better), the 32m knob is a single-file-only workaround and
the SHIP decision is the LAYOUT note — write facts as many
order-preserving files, which the library's writers already do — not a
global conf change.  MEASURED (MULTIFILE_SF10_r11.json): q01
single 3.46 s -> multi-ordered 1.38 s at DEFAULT splits (the entire
single-file gap was file-split parallelism), q03 3.1 s ~ best single,
q05 a wash; the random-order layout is strictly worse (q05 8.8 s —
row-order destruction costs more than splits buy); multi-ordered shows
NO 32m sensitivity anywhere => knob REJECTED, layout rule recorded.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.benchutil import (  # noqa: E402
    ORACLE_TABLES as TABLES,
    noisy_start,
    register_duck_views,
)
from etlbigdata_spark.session import build_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf10"
MF = SF.rstrip("/") + "_mf"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "MULTIFILE_SF10_r11.json")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
QUERIES = ["q01_pricing_summary", "q03_top_orders", "q05_region_revenue"]


def build_mf(spark) -> None:
    """Two multi-file lineitem layouts: MF = repartition(32) (random
    row order — the straw man; destroys the source's natural orderkey
    clustering), MF+'o' = ORDER-PRESERVING split (read at 48m splits,
    write one file per input split — how a real pipeline's writer lands
    a big table: many files, order intact)."""
    for dest, order_preserving in ((MF, False), (MF + "o", True)):
        if os.path.exists(f"{dest}/lineitem.parquet/_SUCCESS"):
            continue
        os.makedirs(dest, exist_ok=True)
        for t in TABLES:
            if t == "lineitem":
                continue
            dst = f"{dest}/{t}.parquet"
            if not os.path.exists(dst):
                os.symlink(f"{SF}/{t}.parquet", dst)
        if order_preserving:
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(48 << 20))
            df = spark.read.parquet(f"{SF}/lineitem.parquet")
        else:
            df = spark.read.parquet(f"{SF}/lineitem.parquet").repartition(32)
        df.write.mode("overwrite").parquet(f"{dest}/lineitem.parquet")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))


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
        "logical_cpus": os.cpu_count(),
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
        ("multi_ord_128m", MF + "o", 128 << 20),
        ("multi_ord_32m", MF + "o", 32 << 20),
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
    register_duck_views(con, SF)
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
    out["noisy_window"] = noisy_start(out["loadavg_start"])
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    summary = {
        name: {lab: v["sec"] for lab, v in grid_v.items()}
        for name, grid_v in out["grid"].items()
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
