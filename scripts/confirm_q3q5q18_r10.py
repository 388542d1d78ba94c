#!/usr/bin/env python
"""Confirmation pass for the round-10 q03/q05/q18 decision (follows
scripts/ab_q03q05q18_r10.py): winners only, interleaved min-of-RUNS,
both engines back-to-back, loadavg stamps.  Emits CONFIRM_Q_r10.json."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402
from scripts.ab_q03q05q18_r10 import q03_cand, q05_cand  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/scaled/sf10")
RUNS = int(os.environ.get("BENCH_RUNS", "7"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "CONFIRM_Q_r10.json")


def main() -> None:
    out: dict = {
        "sf_dir": SF_DIR, "runs": RUNS,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "spark": {}, "duckdb": {},
    }
    spark = build_session(app_name="confirm_q_r10",
                          master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    import scripts.ab_q03q05q18_r10 as ab
    ab.SF_DIR = SF_DIR

    arms = {
        "q03_cand": lambda: q03_cand(spark),
        "q05_cand": lambda: q05_cand(spark),
        "q18_shipped": lambda: workload.QUERIES["q18_large_orders"](spark, SF_DIR),
    }
    mpb = os.environ.get("CONFIRM_MPB", "33554432")
    spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    out["maxPartitionBytes"] = mpb
    for name, mk in arms.items():  # warm-up
        mk().toPandas()
    samples: dict[str, list[float]] = {}
    for _ in range(RUNS):
        for name, mk in arms.items():
            t0 = time.perf_counter()
            mk().toPandas()
            samples.setdefault(name, []).append(round(time.perf_counter() - t0, 2))
        spark.sparkContext._jvm.System.gc()
    for k, v in samples.items():
        out["spark"][k] = min(v)
        print(k, v, flush=True)
    spark.stop()

    import duckdb
    con = duckdb.connect()
    for t in workload.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    for q in ("q03_top_orders", "q05_region_revenue", "q18_large_orders"):
        sql = workload.ORACLE_SQL[q]
        con.sql(sql).fetchall()
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            ts.append(round(time.perf_counter() - t0, 2))
        out["duckdb"][q] = min(ts)
        print(q, "duck", ts, flush=True)

    out["ratios"] = {
        "q03_cand": round(out["spark"]["q03_cand"] / out["duckdb"]["q03_top_orders"], 2),
        "q05_cand": round(out["spark"]["q05_cand"] / out["duckdb"]["q05_region_revenue"], 2),
        "q18_shipped": round(out["spark"]["q18_shipped"] / out["duckdb"]["q18_large_orders"], 2),
    }
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out["ratios"]))


if __name__ == "__main__":
    main()
