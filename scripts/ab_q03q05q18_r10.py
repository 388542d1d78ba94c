#!/usr/bin/env python
"""q03/q05/q18 sf10 decomposition + A/B session (round-10 brief item 2,
the q21 playbook).

Round-9 state: the three remaining >2x real-work rows at sf10 are
q03_top_orders 10.4x, q05_region_revenue 8.6x, q18_large_orders 4.6x vs
DuckDB.  The bucketed co-located layout already removed the join
exchange (BUCKET_EVIDENCE_r09.json) and still read 5.77x/3.66x — the
residual is NOT the join shuffle.  What DuckDB does on these shapes is
fully pipelined hash joins: nothing is ever materialized, the fact
table is scanned once and aggregated into a hash table.  The Spark
translation of that plan shape is: REDUCE FIRST, BROADCAST THE REDUCED
SIDE — never shuffle wide fact rows.

One A/B candidate per query (the brief's list):

* q03 — filter orders by BUILDING customers map-side (broadcast the
  300k customer keys), then broadcast the ~3M qualifying
  (o_orderkey, o_date) pairs into the lineitem scan: the fact is
  joined AND partially aggregated map-side, so the only shuffle is
  ~3M compact (orderkey, date, rev) groups.  No wide-row exchange.
* q05 — dimension-first: customer x nation x region collapses to a
  broadcast (c_custkey, r_name) map (1.5M rows, ~40 MB); orders picks
  up r_name map-side; lineitem pre-aggregates revenue per orderkey
  BEFORE any join (60M -> 15M compact groups, map-side partial), then
  one narrow SMJ on orderkey and a 5-group final agg.  The 60M-row
  custkey shuffle of the shipped plan disappears.
* q18 — the >150-qty aggregate IS selective: broadcast it back into
  orders (map-side), broadcast (c_custkey, c_name) into the result.
  The only shuffle left is the quantity pre-agg itself.

Scale honesty: the broadcast sides here scale with SF (3M orders /
1.5M customers at sf10).  At the 100 TB design point AQE would pick
shuffle joins for those edges again — the durable part of the rewrite
is the REDUCE-FIRST shape (pre-agg before join, narrow columns into
every exchange), which cuts shuffle bytes by the same ratio at every
scale.  The script records both plans' shuffle-bytes to pin that.

Protocol: one Spark session, per-variant interleaved min-of-RUNS after
a warm-up; per-stage decomposition via noop-sink writes of cumulative
sub-plans; DuckDB pairs measured back-to-back in the same process;
loadavg + floor stamps (round-10 noise rule).  Emits
AB_Q3Q5Q18_r10.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.operators import fixedpoint as fx  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/scaled/sf10")
RUNS = int(os.environ.get("BENCH_RUNS", "5"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "AB_Q3Q5Q18_r10.json")


def load(spark, t):
    return workload.load(spark, SF_DIR, t)


# ---------------------------------------------------------------- q03
def q03_cand(spark):
    cust = (
        load(spark, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders_f = (
        load(spark, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("o_date"))
    )
    li = load(spark, "lineitem")
    rev4 = fx.money_times_pct("l_extendedprice", "l_discount", negate_pct=True)
    return (
        li.join(F.broadcast(orders_f), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_date")
        .agg(F.sum(rev4).alias("__r4"))
        .select("o_orderkey", "o_date", fx.unscale_to_double(F.col("__r4"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q03_stages(spark):
    """Cumulative sub-plans of the CANDIDATE, noop-sunk."""
    cust = (
        load(spark, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    )
    orders_f = (
        load(spark, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("o_date"))
    )
    li = load(spark, "lineitem")
    rev4 = fx.money_times_pct("l_extendedprice", "l_discount", negate_pct=True)
    scan = li.select("l_orderkey", "l_extendedprice", "l_discount")
    joined = li.join(F.broadcast(orders_f), F.col("l_orderkey") == F.col("o_orderkey"))
    agg = joined.groupBy("o_orderkey", "o_date").agg(F.sum(rev4).alias("__r4"))
    return {
        "scan_prune_li": scan,
        "orders_bcast_filter": orders_f,
        "join_mapside": joined.select(F.count(F.lit(1)).alias("n")),
        "join_agg": agg,
    }


# ---------------------------------------------------------------- q05
def q05_cand(spark):
    cust = load(spark, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, "nation").select("n_nationkey", "n_regionkey")
    region = load(spark, "region").select("r_regionkey", "r_name")
    cr = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "r_name")
    )
    orders_r = (
        load(spark, "orders")
        .select("o_orderkey", "o_custkey")
        .join(F.broadcast(cr), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "r_name")
    )
    li = load(spark, "lineitem")
    rev4 = fx.money_times_pct("l_extendedprice", "l_discount", negate_pct=True)
    li_agg = li.groupBy("l_orderkey").agg(F.sum(rev4).alias("__r4"))
    return (
        li_agg.join(orders_r, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("r_name")
        .agg(F.sum("__r4").alias("__r4s"))
        .select("r_name", fx.unscale_to_double(F.col("__r4s"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


def q05_stages(spark):
    cust = load(spark, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, "nation").select("n_nationkey", "n_regionkey")
    region = load(spark, "region").select("r_regionkey", "r_name")
    cr = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "r_name")
    )
    orders_r = (
        load(spark, "orders")
        .select("o_orderkey", "o_custkey")
        .join(F.broadcast(cr), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "r_name")
    )
    li = load(spark, "lineitem")
    rev4 = fx.money_times_pct("l_extendedprice", "l_discount", negate_pct=True)
    li_agg = li.groupBy("l_orderkey").agg(F.sum(rev4).alias("__r4"))
    return {
        "dim_map_build": cr,
        "orders_pickup_region": orders_r,
        "li_preagg": li_agg,
        "final_join_agg": li_agg.join(orders_r, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("r_name")
        .agg(F.sum("__r4").alias("s")),
    }


# ---------------------------------------------------------------- q18
def q18_cand(spark):
    li = load(spark, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = load(spark, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, "customer").select("c_custkey", "c_name")
    j = orders.join(F.broadcast(big), F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        j.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


def q18_stages(spark):
    li = load(spark, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = load(spark, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    j = orders.join(F.broadcast(big), F.col("l_orderkey") == F.col("o_orderkey"))
    return {
        "qty_preagg_filter": big,
        "orders_bcast_join": j.select(F.count(F.lit(1)).alias("n")),
    }


CANDIDATES = {
    "q03_top_orders": q03_cand,
    "q05_region_revenue": q05_cand,
    "q18_large_orders": q18_cand,
}
STAGES = {
    "q03_top_orders": q03_stages,
    "q05_region_revenue": q05_stages,
    "q18_large_orders": q18_stages,
}


def t_fetch(df) -> float:
    t0 = time.perf_counter()
    df.toPandas()
    return time.perf_counter() - t0


def t_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    out: dict = {
        "sf_dir": SF_DIR,
        "runs": RUNS,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "spark": {},
        "stages": {},
        "duckdb": {},
        "equal": {},
    }
    spark = build_session(app_name="ab_q3q5q18_r10", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")

    # result equality: candidate must reproduce the shipped rows exactly
    if os.environ.get("SKIP_EQ", "") != "1":
        for q, cand in CANDIDATES.items():
            a = [tuple(r) for r in workload.QUERIES[q](spark, SF_DIR).collect()]
            b = [tuple(r) for r in cand(spark).collect()]
            out["equal"][q] = sorted(map(repr, a)) == sorted(map(repr, b))
            print(q, "equal:", out["equal"][q], flush=True)

    # interleaved min-of-RUNS: shipped vs candidate, each at the session
    # default 128m input splits AND at 32m (the r8 knob session's "one
    # box, one file" residual: sf10 facts are ONE ~1.8 GB parquet file,
    # so 128m yields ~14 splits for 32 cores; at the 100 TB design
    # point a corpus is thousands of files and this arm is moot)
    arms = {"mpb128": "134217728", "mpb32": "33554432"}
    samples: dict[str, list[float]] = {}
    for _ in range(RUNS):
        for arm, mpb in arms.items():
            spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
            for q, cand in CANDIDATES.items():
                samples.setdefault(f"{q}|shipped|{arm}", []).append(
                    t_fetch(workload.QUERIES[q](spark, SF_DIR))
                )
                samples.setdefault(f"{q}|cand|{arm}", []).append(t_fetch(cand(spark)))
        spark.sparkContext._jvm.System.gc()
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    for k, v in samples.items():
        out["spark"][k] = round(min(v), 3)
        print(k, [round(x, 2) for x in v], flush=True)

    # per-stage decomposition (candidate sub-plans, noop sink, min of 3)
    for q, mk in STAGES.items():
        out["stages"][q] = {}
        for stage, df in mk(spark).items():
            ts = [t_noop(df) for _ in range(3)]
            out["stages"][q][stage] = round(min(ts), 3)
            print(q, stage, [round(x, 2) for x in ts], flush=True)

    spark.stop()

    import duckdb

    con = duckdb.connect()
    for t in workload.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    for q in CANDIDATES:
        sql = workload.ORACLE_SQL[q]
        con.sql(sql).fetchall()  # warm-up
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            ts.append(time.perf_counter() - t0)
        out["duckdb"][q] = round(min(ts), 3)
        print(q, "duck", [round(x, 2) for x in ts], flush=True)

    out["ratios"] = {
        q: {
            arm: round(out["spark"][f"{q}|{arm}"] / out["duckdb"][q], 2)
            for arm in ("shipped|mpb128", "cand|mpb128", "shipped|mpb32", "cand|mpb32")
            if f"{q}|{arm}" in out["spark"]
        }
        for q in CANDIDATES
    }
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out["ratios"]))


if __name__ == "__main__":
    main()
