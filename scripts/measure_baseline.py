#!/usr/bin/env python
"""Measure the BASELINE engines (BASELINE.md protocol): DuckDB and pandas
on the headline queries at sf0.1, to fill the BASELINE.md table.

DuckDB runs the oracle SQL verbatim. pandas runs hand-written equivalents
of the three anchor queries only (the reference's engine class can't
express most of the rest without bespoke code — that absence is the
point of the comparison).

Usage: python scripts/measure_baseline.py [sf_dir]
Prints one JSON line: {"duckdb": {...}, "pandas": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbigdata_spark import workload  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

HEADLINE = [
    "q01_pricing_summary", "q02_min_cost_supplier", "q03_top_orders",
    "q06_revenue_delta", "q04_priority_with_late_lines", "q05_region_revenue",
    "q07_nation_volume", "q08_market_share", "q09_product_type_profit",
    "q10_returned_items", "q11_important_parts",
    "q12_shipmode_priority", "q13_customer_distribution",
    "q14_promo_share", "q15_top_supplier", "q16_supplier_relationship",
    "q17_small_quantity_revenue",
    "q18_large_orders", "q19_disjunctive_predicates", "q20_heavy_shippers",
    "q21_sole_failing_supplier", "q22_idle_rich_customers",
    "b06_grouping_sets", "b07_topk_group",
    "b09_asof", "b09_theta", "b10_running_sum",
    "b31_merge_upsert", "b40_table_diff",
    "evt03_sessionize", "b10_range_frame",
    "b15_json", "b15_from_json", "b16_pivot", "t01_text_stats",
    "t02_token_count", "d01_dup_groups", "d02_jaccard_pairs",
    "d08_containment_pairs", "d10_duplicated_spans",
    "t14_surprisal",
    "s01_cosine_topk", "st02_sessions", "st03_watermark",
    # round-11: pair the bench headline's newer rows too (they were
    # covered only by NEWOPS_SF1_r09.json point measurements before)
    "t20_c4_clean", "t21_chunking", "t22_epoch_mix",
    "t23_packed_span_dedup", "t24_shuffle_shards",
    "d03_minhash", "d04_simhash",
]

# Same subset filter as bench.py (targeted scale points, e.g. sf10).
_SUBSET = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
if _SUBSET:
    _want = {s.strip() for s in _SUBSET.split(",") if s.strip()}
    HEADLINE = [n for n in HEADLINE if n in _want]


def _median(fn) -> float:
    fn()  # warm-up
    return statistics.median(
        [(lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter()) for _ in range(RUNS)]
    )


def duckdb_times() -> dict[str, float]:
    import duckdb

    from etlbigdata_spark.benchutil import register_duck_views

    con = duckdb.connect()
    # shared helper (round 12): handles single-file AND multi-file
    # (directory) table layouts identically for both engines
    register_duck_views(con, SF_DIR)
    out = {}
    for name in HEADLINE:
        sql = workload.ORACLE_SQL.get(name)
        if sql is None:
            continue
        # .arrow(), not .fetchall(): matched Arrow destination on both
        # engines (round-12 protocol, bench.py docstring) — fetchall
        # builds 10^7s of Python tuples on big results and measures
        # object conversion, not the engine
        out[name] = round(_median(lambda: con.sql(sql).arrow()), 4)
    return out


def pandas_times() -> dict[str, float]:
    import pandas as pd

    # reads happen inside each query: Spark and the DuckDB views also
    # re-scan the parquet per execution, so the baseline pays it too
    def q01():
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        d = li[li.l_shipdate <= pd.Timestamp("1998-09-02")]
        g = d.assign(
            disc_price=d.l_extendedprice * (1 - d.l_discount),
            charge=d.l_extendedprice * (1 - d.l_discount) * (1 + d.l_tax),
        ).groupby(["l_returnflag", "l_linestatus"])
        return g.agg(
            sum_qty=("l_quantity", "sum"), sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"), sum_charge=("charge", "sum"),
            avg_qty=("l_quantity", "mean"), avg_price=("l_extendedprice", "mean"),
            avg_disc=("l_discount", "mean"), count_order=("l_quantity", "size"),
        ).reset_index()

    def q03():
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
        c = cust[cust.c_mktsegment == "BUILDING"]
        j = c.merge(orders, left_on="c_custkey", right_on="o_custkey").merge(
            li, left_on="o_orderkey", right_on="l_orderkey"
        )
        j = j.assign(rev=j.l_extendedprice * (1 - j.l_discount))
        g = j.groupby(["o_orderkey", "o_orderdate"])["rev"].sum().reset_index()
        return g.sort_values(["rev", "o_orderkey"], ascending=[False, True]).head(10)

    def q05():
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
        cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
        nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
        region = pd.read_parquet(f"{SF_DIR}/region.parquet")
        j = (
            li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
            .merge(cust, left_on="o_custkey", right_on="c_custkey")
            .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
            .merge(region, left_on="n_regionkey", right_on="r_regionkey")
        )
        j = j.assign(rev=j.l_extendedprice * (1 - j.l_discount))
        return j.groupby("r_name")["rev"].sum().sort_values(ascending=False).reset_index()

    return {name: round(_median(fn), 4) for name, fn in [
        ("q01_pricing_summary", q01), ("q03_top_orders", q03), ("q05_region_revenue", q05),
    ]}


if __name__ == "__main__":
    # noise stamp (round 10): pairs read against a bench.py run carry
    # host-load evidence on both sides — see BASELINE.md "Noise
    # read-rule"
    _load_start = os.getloadavg()
    print(json.dumps({
        "loadavg_start": [round(x, 2) for x in _load_start],
        "duckdb": duckdb_times(),
        # SKIP_PANDAS=1 skips the pandas anchors (at sf10 the q05 anchor
        # alone is ~9 min x runs; pandas numbers don't change round to
        # round - carry the last measured artifact's values instead)
        "pandas": {} if os.environ.get("SKIP_PANDAS", "").lower() in ("1", "true", "yes") else pandas_times(),
        "sf": SF_DIR,
        "runs": RUNS,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }))
