#!/usr/bin/env python
"""Dump the formatted physical plan of one or more declared queries to
plans/<outdir>/<query>_<tag>.txt — the per-round before/after evidence
the optimization briefs require (explain("formatted") at the given SF).

Usage: python scripts/dump_query_plan.py <tag> <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       PLAN_OUT_DIR       (default plans/r13)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("PLAN_OUT_DIR", "plans/r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session()
    for name in names:
        fn = workload.QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan.splitlines())} lines, {n_ex} Exchange -> {path}")


if __name__ == "__main__":
    main()
