#!/usr/bin/env python
"""Head-to-head vs the reference's execution pattern, on the reference's
OWN operator set (SURVEY §2 Part A) at the same data scale.

The reference executes each Transform click as: re-create a Spark frame
from the pandas-resident table, run ONE operator, then ``toPandas()``
the whole table back (``/root/reference/simple_etl.py:166, 197, 208,
226, 239, ...``). This script times that exact pattern against the new
engine's fused ``Pipeline`` (same ops, one Catalyst plan, one action) on
the sf0.1 ``orders``/``customer`` tables.

Prints one JSON line: {"reference_pattern_sec": ..., "fused_sec": ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etlbigdata_spark.engine import Engine  # noqa: E402
from etlbigdata_spark.operators import joins  # noqa: E402
from etlbigdata_spark.plans.pipeline import _OPS, Pipeline  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

# The cleaning pipeline every reference user runs (SURVEY §5.1 fixture
# semantics): fill → dedup → replace → filter → split → merge → cast → join.
STEPS = [
    {"op": "fill_nulls", "text_fill": "N/A", "numeric_fill": 0},
    {"op": "dedup"},
    {"op": "replace_value", "column": "o_orderpriority", "old": "1-URGENT", "new": "URGENT"},
    {"op": "filter_contains", "column": "o_orderstatus", "needle": "O"},
    {"op": "split_column", "column": "o_orderpriority", "delimiter": "-", "n_parts": 2},
    {"op": "merge_columns", "columns": ["o_orderstatus", "o_orderpriority"], "separator": "|", "new_name": "status_prio"},
    {"op": "cast_column", "column": "o_orderdate", "type_name": "date"},
    {"op": "join", "right": "customer", "left_on": "o_custkey", "right_on": "c_custkey", "how": "left"},
]


def reference_pattern(engine: Engine) -> int:
    """The reference's loop: pandas-resident table, per-op JVM round-trip."""
    spark = engine.spark
    pdf = spark.read.parquet(f"{SF_DIR}/orders.parquet").toPandas()  # Extract (pandas-resident)
    cust_pdf = spark.read.parquet(f"{SF_DIR}/customer.parquet").toPandas()
    for step in STEPS:
        df = spark.createDataFrame(pdf)  # simple_etl.py:166
        kwargs = {k: v for k, v in step.items() if k != "op"}
        if step["op"] == "join":
            right = spark.createDataFrame(cust_pdf)  # :329
            df = joins.join(df, right, kwargs["left_on"], kwargs["right_on"], kwargs["how"])
        else:
            df = _OPS[step["op"]](df, **kwargs)
        pdf = df.toPandas()  # simple_etl.py:197 et al. — per-click materialization
    return len(pdf)


def fused(engine: Engine) -> int:
    """New engine: same ops, one lazy plan, one action."""
    orders = engine.load_parquet(f"{SF_DIR}/orders.parquet", name="orders")
    engine.load_parquet(f"{SF_DIR}/customer.parquet", name="customer")
    out = Pipeline(STEPS).apply(orders, catalog=engine.catalog)
    return len(out.toPandas())


def median_time(fn) -> tuple[float, int]:
    n = fn()  # warm-up
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        n = fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples), n


def main() -> None:
    engine = Engine(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    fused_sec, n_fused = median_time(lambda: fused(engine))
    ref_sec, n_ref = median_time(lambda: reference_pattern(engine))
    assert n_fused == n_ref, (n_fused, n_ref)
    print(json.dumps({
        "reference_pattern_sec": round(ref_sec, 4),
        "fused_sec": round(fused_sec, 4),
        "speedup": round(ref_sec / fused_sec, 2),
        "rows_out": n_fused,
        "sf": SF_DIR,
        "ops": len(STEPS),
    }))


if __name__ == "__main__":
    main()
