#!/usr/bin/env python
"""Round-9 bucketed co-located join demonstration (VERDICT r8 item 4).

q03/q05's residual vs DuckDB at sf10 was quantified in round 8 as the
single-box shuffle materialization of the 60 M-row lineitem⋈orders
join — the thing a 1000-executor cluster amortizes.  But the repo owns
a shuffle-ELIMINATION lever today: ``operators/scale.write_bucketed`` +
``bucketed_join`` (exchange-free plan pinned in tests/test_scale.py).
This script demonstrates it on the real q03/q05 join shapes at sf10:

1. One-time layout: write lineitem + orders bucketed AND sorted by
   orderkey (32 buckets — one per core here; a cluster uses more).
   The cost is recorded: it amortizes across EVERY subsequent
   orderkey-keyed join the way a warehouse layout decision does.
   Only the query-relevant columns are copied — the raw-parquet
   comparators read the same pruned columns, so this biases nothing.
2. q03 variants: shipped (raw parquet), raw + broadcast-hinted
   BUILDING customers (isolates the broadcast choice from bucketing),
   bucketed + broadcast (the co-located plan: ZERO hash exchanges —
   the orderkey SMJ zips sorted buckets, the per-order aggregate
   reuses the bucket partitioning, top-10 is TakeOrdered).
3. q05 variants: shipped vs bucketed (fact⋈fact exchange-free; the
   o_custkey⋈customer exchange and tiny r_name agg remain — bucketing
   removes exactly the orderkey materialization, stated).
4. DuckDB runs Q03/Q05 on the same sf10 parquet in the same session.

All variants are asserted result-identical before timing; timing is
interleaved min-of-RUNS with the DataFrame rebuilt per run (AQE
stage-reuse trap).  Emits BUCKET_EVIDENCE_r09.json.
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etlbigdata_spark.operators import fixedpoint as fx
from etlbigdata_spark.operators import scale
from etlbigdata_spark.session import build_session
from etlbigdata_spark.workload import Q03_SQL, Q05_SQL, QUERIES, load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfscale/sf10")
RUNS = int(os.environ.get("RUNS", "5"))
WAREHOUSE = os.environ.get("BUCKET_WAREHOUSE", "/tmp/sfscale/wh_r09")

LI_COLS = ["l_orderkey", "l_extendedprice", "l_discount"]
ORD_COLS = ["o_orderkey", "o_custkey", "o_orderdate"]


def _rev4():
    return fx.money_times_pct("l_extendedprice", "l_discount", negate_pct=True)


def q03_bucketed(spark):
    cust = (
        load(spark, SF_DIR, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return (
        spark.table("ord_bkt")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(spark.table("li_bkt"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("o_date"))
        .agg(F.sum(_rev4()).alias("__r4"))
        .select(
            "o_orderkey", "o_date",
            fx.unscale_to_double(F.col("__r4"), 4).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q03_raw_bcast(spark):
    """Raw parquet + the same broadcast hint — isolates bucketing."""
    cust = (
        load(spark, SF_DIR, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, SF_DIR, "orders").select(*ORD_COLS)
    li = load(spark, SF_DIR, "lineitem").select(*LI_COLS)
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("o_date"))
        .agg(F.sum(_rev4()).alias("__r4"))
        .select(
            "o_orderkey", "o_date",
            fx.unscale_to_double(F.col("__r4"), 4).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q05_bucketed(spark):
    cust = load(spark, SF_DIR, "customer")
    nation = load(spark, SF_DIR, "nation")
    region = load(spark, SF_DIR, "region")
    return (
        spark.table("li_bkt")
        .join(spark.table("ord_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.sum(_rev4()).alias("__r4"))
        .select("r_name", fx.unscale_to_double(F.col("__r4"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


def _final_tree(df):
    return (
        df._jdf.queryExecution().executedPlan().toString()
        .split("+- == Initial Plan ==")[0]
    )


def main() -> None:
    spark = build_session(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.warehouse.dir": f"file://{WAREHOUSE}"},
    )
    results: dict = {"sf_dir": SF_DIR, "runs": RUNS, "times": {}}

    t0 = time.perf_counter()
    if not spark.catalog.tableExists("li_bkt"):
        scale.write_bucketed(
            load(spark, SF_DIR, "lineitem").select(*LI_COLS),
            "li_bkt", ["l_orderkey"], n_buckets=32, sort_keys=["l_orderkey"],
        )
        scale.write_bucketed(
            load(spark, SF_DIR, "orders").select(*ORD_COLS),
            "ord_bkt", ["o_orderkey"], n_buckets=32, sort_keys=["o_orderkey"],
        )
        results["bucketed_write_sec"] = round(time.perf_counter() - t0, 3)
    else:
        results["bucketed_write_sec"] = "cached (pre-existing tables)"

    variants = {
        "q03_shipped": lambda: QUERIES["q03_top_orders"](spark, SF_DIR),
        "q03_raw_bcast": lambda: q03_raw_bcast(spark),
        "q03_bucketed": lambda: q03_bucketed(spark),
        "q05_shipped": lambda: QUERIES["q05_region_revenue"](spark, SF_DIR),
        "q05_bucketed": lambda: q05_bucketed(spark),
    }

    # equivalence gates
    rows = {k: sorted(tuple(r) for r in fn().collect()) for k, fn in variants.items()}
    assert rows["q03_shipped"] == rows["q03_raw_bcast"] == rows["q03_bucketed"]
    assert rows["q05_shipped"] == rows["q05_bucketed"]

    # plan gates: the bucketed q03 carries NO hash exchange at all; the
    # bucketed q05 carries none on the orderkey
    p03 = _final_tree(q03_bucketed(spark))
    assert "SelectedBucketsCount" in p03, p03
    assert not re.search(r"Exchange hashpartitioning", p03), p03
    p05 = _final_tree(q05_bucketed(spark))
    assert "SelectedBucketsCount" in p05, p05
    assert not re.search(r"Exchange hashpartitioning\((?:l_|o_)orderkey", p05), p05
    results["plan_q03_bucketed_hash_exchanges"] = 0
    results["plan_q05_bucketed_orderkey_exchanges"] = 0

    for _ in range(RUNS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().toPandas()
            results["times"].setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )

    # DuckDB same-session pair
    import duckdb

    con = duckdb.connect()
    con.sql(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in ["customer", "orders", "lineitem", "nation", "region"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for name, sql in (("duck_q03", Q03_SQL), ("duck_q05", Q05_SQL)):
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            results["times"].setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )

    results["min"] = {k: min(v) for k, v in results["times"].items()}
    m = results["min"]
    results["ratios"] = {
        "q03_shipped_vs_duck": round(m["q03_shipped"] / m["duck_q03"], 2),
        "q03_bucketed_vs_duck": round(m["q03_bucketed"] / m["duck_q03"], 2),
        "q03_bucketed_vs_shipped": round(m["q03_bucketed"] / m["q03_shipped"], 2),
        "q05_shipped_vs_duck": round(m["q05_shipped"] / m["duck_q05"], 2),
        "q05_bucketed_vs_duck": round(m["q05_bucketed"] / m["duck_q05"], 2),
        "q05_bucketed_vs_shipped": round(m["q05_bucketed"] / m["q05_shipped"], 2),
    }
    line = json.dumps(results)
    print(line)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BUCKET_EVIDENCE_r09.json",
    )
    with open(out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
