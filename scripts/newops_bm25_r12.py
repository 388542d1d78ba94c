#!/usr/bin/env python
"""Scale evidence for the round-12 BM25 retrieval family
(NEWOPS discipline: fresh same-session pairs + the production-path
payoff measurement, matched-Arrow protocol, benchutil noise stamps).

Three measurements per scale point (default sf1o and sf10o, the
order-preserving multi-file fixtures):

1. **s10 pair** — the direct-scan BM25 face vs DuckDB on the identical
   oracle SQL (the correctness face both engines share).
2. **Index build** — ``bm25_write_index`` wall-clock (paid once).
3. **Probe payoff** — ``bm25_probe_index`` against the PRE-BUILT index
   vs the direct scan: the pruned probe reads |query-term buckets| /
   n_buckets of the postings files instead of re-tokenizing the
   corpus, so this ratio is the per-query production win (result
   equality asserted before timing).

Emits NEWOPS_BM25_r12.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.benchutil import noisy_start, register_duck_views  # noqa: E402
from etlbigdata_spark.functions import text as ftext  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402

SFS = sys.argv[1:] or ["/tmp/scaled/sf1o", "/tmp/scaled/sf10o"]
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
OUT = "NEWOPS_BM25_r12.json"
N_BUCKETS = 64


def tmin(fn, runs=RUNS):
    fn()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def main() -> None:
    out: dict = {
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "runs": RUNS, "n_buckets": N_BUCKETS,
    }
    spark = build_session(app_name="newops_bm25_r12", master="local[32]")
    for sf in SFS:
        r: dict = {}
        queries = spark.createDataFrame(
            workload._S10_QUERIES, "query_id int, query_text string"
        )
        docs = workload.load(spark, sf, "documents")

        # 1) direct-scan pair (the s10 face both engines share)
        r["s10_spark_sec"] = tmin(
            lambda: workload.s10_bm25_topk(spark, sf).toArrow()
        )
        con = duckdb.connect()
        register_duck_views(con, sf)
        r["s10_duckdb_sec"] = tmin(
            lambda: con.sql(workload.ORACLE_SQL["s10_bm25_topk"]).arrow()
        )
        r["s10_ratio"] = round(r["s10_spark_sec"] / r["s10_duckdb_sec"], 2)

        # 2) build once + 3) pruned probe vs direct scan
        idx = tempfile.mkdtemp(prefix="bm25_newops_")
        try:
            t0 = time.perf_counter()
            ftext.bm25_write_index(docs, idx, n_buckets=N_BUCKETS)
            r["index_build_sec"] = round(time.perf_counter() - t0, 3)
            r["index_bytes"] = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _d, fs in os.walk(idx) for f in fs
            )
            probe = lambda: ftext.bm25_probe_index(spark, idx, queries, k=10)  # noqa: E731
            direct = lambda: ftext.bm25_topk(docs, queries, k=10)  # noqa: E731
            got = sorted(map(tuple, probe().collect()))
            want = sorted(map(tuple, direct().collect()))
            assert got == want and len(got) > 0, f"{sf}: probe != direct"
            ftext.release_cached()

            def probed():
                probe().toArrow()
                ftext.release_cached()

            def directed():
                direct().toArrow()
                ftext.release_cached()

            r["probe_prebuilt_sec"] = tmin(probed)
            r["direct_scan_sec"] = tmin(directed)
            r["probe_speedup_x"] = round(
                r["direct_scan_sec"] / r["probe_prebuilt_sec"], 2
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)
        out[sf] = r
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    out["noisy_window"] = noisy_start(out["loadavg_start"])
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
