#!/usr/bin/env python
"""Quick min-of-N timer for individual declared queries — interim
measurement while iterating (the artifact of record stays the paired
full bench.py protocol).  Times construction + toArrow fetch, same as
bench.py's methodology, clearing scoped caches between runs.

Usage: python scripts/time_queries.py <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), RUNS (3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "3"))
    spark = build_session()
    for name in names:
        fn = workload.QUERIES[name]
        fn(spark, sf_dir).toArrow()  # warm-up, same as bench.py
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).toArrow()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        print(f"{name}: {best:.3f}s (min of {runs})")


if __name__ == "__main__":
    main()
