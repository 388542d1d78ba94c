#!/usr/bin/env python
"""Same-session Spark/DuckDB pairs for the round-9 continuation ops
(t20 C4 cleaning, t21 chunking, s09 PQ oracle face) at a scaled SF.

Usage: python scripts/newops_pairs.py [sf_dir] [out_json]
Defaults: /tmp/sfscale/sf1  NEWOPS_SF1_r09.json

Protocol (BASELINE.md): min of BENCH_RUNS (default 2) after one
warm-up, one session per engine, Spark first then DuckDB back-to-back
on the same box.  Both engines run the IDENTICAL declared face — for
t20 that includes the lined-text fixture, for s09 the md5-sampled-
codebook expression encode (an index-BUILD step re-run inline; the
production kmeans+blas path is recall-pinned in tests, see the
rebuild-inline caveat in bench.py's docstring).
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

QUERIES = ("t20_c4_clean", "t21_chunking", "s09_pq_topk")
SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "NEWOPS_SF1_r09.json"
RUNS = int(os.environ.get("BENCH_RUNS", "2"))


def main() -> None:
    out = {"sf_dir": SF, "runs": RUNS, "spark": {}, "duckdb": {}}
    spark = build_session(
        app_name="newops_pairs", master="local[32]", shuffle_partitions=32
    )
    for name in QUERIES:
        fn = workload.QUERIES[name]
        fn(spark, SF).toPandas()  # warm-up: plan, codegen, IO cache
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            fn(spark, SF).toPandas()
            ts.append(round(time.time() - t0, 3))
        out["spark"][name] = min(ts)
        print(name, "spark", ts, flush=True)
    spark.stop()

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
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
    out["ratios"] = {
        k: round(out["spark"][k] / out["duckdb"][k], 2) for k in out["spark"]
    }
    out["protocol_note"] = (
        "min of %d after warm-up, one session per engine, back-to-back same-box; "
        "identical declared faces on both engines (s09 = oracle face, see module doc)"
        % RUNS
    )
    # MERGE into an existing artifact rather than clobbering it: the
    # committed NEWOPS jsons carry hand-added sections (production-path
    # numbers, growth decompositions) that BASELINE.md cites — a plain
    # repro run must refresh the pair keys and keep everything else
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
        # deep-merge per section: hand-added keys nested inside
        # spark/duckdb/ratios (growth decompositions, production-path
        # numbers) must survive a repro run, so update key-by-key
        # instead of replacing whole sections
        for key, val in out.items():
            if isinstance(val, dict) and isinstance(prev.get(key), dict):
                prev[key].update(val)
            else:
                prev[key] = val
        out = prev
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out["ratios"]))


if __name__ == "__main__":
    main()
