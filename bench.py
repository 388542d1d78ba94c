#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the headline queries from the declared workload at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timing is wall-clock of plan-build + execution to a driver-side
fetch (``toArrow``), **min of BENCH_RUNS runs** after one warm-up, one
reused SparkSession, JVM startup excluded — matching BASELINE.md's
protocol section. Min, not median: this machine shows multi-second
GC/neighbor pauses that would dominate a median (see the inline comment
in ``time_query``); min is the per-query capability floor.

Fetch destination (round 12): Arrow, on BOTH engines of every pair —
the matched interchange format a downstream consumer reads zero-copy.
Rounds 1-11 fetched Spark→pandas vs DuckDB→Python tuples, which is
destination-MISMATCHED and, on multi-million-row results, measures
object conversion instead of the engine: evt03's 5.7M-row result at
sf10 read 32 s toPandas / 16.5 s after the r12 narrow-row rewrite —
but 1.3 s toArrow — against DuckDB's 10.1 s fetchall / 5.3 s arrow()
(EVT03_DECOMP_r12.json + BASELINE.md round-12 protocol note).  For the
typical headline row (KB-scale results) the change is sub-noise.

The run also measures ``floor_sec``: the fixed cost of ANY Spark query on
this machine (plan analysis + DAG/task scheduling + Arrow fetch for a
1-row scan). BASELINE.md's "Gate, decomposed" section records the
floor-adjusted form ``spark ≤ 2×duckdb + floor`` together with the honest
accounting: at sf0.1 every DuckDB number except d02 (1.2 s of real
work, where Spark lands at 1.3× — inside even the plain 2× gate) is
3–100 ms, so the adjusted gate otherwise passes only where Spark's
plan-size-proportional analysis cost is tiny — the graded evidence at
this SF is plan quality and scaling, not the ratio (see BASELINE.md).

The headline set benches PRODUCTION paths only: d03 (r×b MinHash) is in,
its proof-apparatus twin d03v (recall-mode r=1/b=32, candidate set ≈
all near pairs by construction) stays in the driver correctness window
but NOT here — benching it would report a plan the module itself
documents as the thing not to run at scale (functions/dedup.py).
Same call for d07_incremental_dedup (promoted to the driver window in
round 5): its oracle face rebuilds the corpus index inline and runs
r=1 recall banding + exact verification so DuckDB can check it
all-pairs; the production path is incremental_minhash_pairs against a
PRE-BUILT parquet index (r×b banding, no exact verify), whose cost a
rebuild-every-run bench would misstate ~3×.  And for
d09_semantic_dedup (round 6): its oracle face pins the cell count at 8
so DuckDB can replay the exact algorithm, which at sf1 means ~6k-row
cells and an O(Σ|cell|²) within-cell join the module documents as the
thing you SCALE THE CELL COUNT to avoid (SemDeDup runs 10⁴–10⁵
k-means cells at web scale; see functions/similarity.py) — benching
the 8-cell face would report the deliberately-unscaled correctness
twin.  d10_duplicated_spans IS production-shaped (linear in the token
stream, no pair join) and is in the headline set.  Round-9
continuation: t20 (C4 rule cleaning) and t21 (chunking) are in — both
are the production path itself (map-side codegen, no oracle-only
scaffolding); s09_pq_topk stays out by the d03v/d09 rule (its face
runs the md5-sampled-codebook expression twin so DuckDB can replay
it; production PQ is kmeans codebooks + the BLAS/LUT ADC path, pinned
in tests/test_recall.py).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.benchutil import noisy_start  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

# Headline set: the three BASELINE.md anchor queries, the TPC-H-style
# plan-shape series, plus one representative per capability family
# (agg, window, join, text, dedup, similarity, json).
HEADLINE = [
    "q01_pricing_summary",
    "q02_min_cost_supplier",
    "q03_top_orders",
    "q05_region_revenue",
    "q06_revenue_delta",
    "q04_priority_with_late_lines",
    "q07_nation_volume",
    "q08_market_share",
    "q09_product_type_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_relationship",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q20_heavy_shippers",
    "q21_sole_failing_supplier",
    "q22_idle_rich_customers",
    "b06_grouping_sets",
    "b07_topk_group",
    "b09_asof",
    "b09_theta",
    "b10_running_sum",
    "b31_merge_upsert",
    "b40_table_diff",
    "evt03_sessionize",
    "b10_range_frame",
    "b15_json",
    "b15_from_json",
    "b16_pivot",
    "t01_text_stats",
    "t02_token_count",
    "t20_c4_clean",
    "t21_chunking",
    "t22_epoch_mix",
    "d01_dup_groups",
    "d02_jaccard_pairs",
    "d08_containment_pairs",
    "d10_duplicated_spans",
    "t23_packed_span_dedup",
    "t24_shuffle_shards",
    "t14_surprisal",
    "d03_minhash",
    "d04_simhash",
    "s01_cosine_topk",
    "s10_bm25_topk",
    "st02_sessions",
    "st03_watermark",
]

# Excluded-from-headline registry (VERDICT r9 item 5). These queries'
# DECLARED faces inline an index-BUILD step or run deliberately-unscaled
# proof apparatus so a cross-engine oracle can replay them (rationale in
# the module docstring above); benching the declared face would misstate
# the production path the module documents. The dict is authoritative:
# additions require a written reason here and are pinned by
# tests/test_oracle.py::test_bench_exclusion_list_is_pinned, so the set
# cannot silently grow.
EXCLUDED_FROM_HEADLINE = {
    "d03v_minhash_verified": (
        "recall-mode r=1/b=32 banding makes the candidate set ~ all near "
        "pairs by construction — the documented do-not-run-at-scale proof "
        "twin of d03_minhash, which IS benched"
    ),
    "d07_incremental_dedup": (
        "oracle face rebuilds the corpus index inline every run and adds "
        "exact verification; production is incremental_minhash_pairs "
        "against a PRE-BUILT parquet index (~3x cheaper)"
    ),
    "d09_semantic_dedup": (
        "oracle face pins 8 k-means cells so DuckDB can replay the "
        "within-cell O(sum|cell|^2) join; production scales the cell "
        "count (1e4-1e5 at web scale) precisely to avoid that join size"
    ),
    "s09_pq_topk": (
        "oracle face re-runs the md5-sampled-codebook expression encode "
        "(an index BUILD) per query; production encodes once via BLAS "
        "and probes persisted codes — pinned in tests/test_recall.py"
    ),
    "st15_stream_packed_span_dedup": (
        "declared face re-packs the corpus and re-builds the persisted "
        "span index inline every run (the d07 rebuild-inline class); "
        "production probes a PRE-BUILT index per micro-batch"
    ),
    "s12_bm25_index_probe": (
        "declared face re-tokenizes the corpus and re-writes the "
        "bucket-partitioned postings index inline every run (the d07 "
        "rebuild-inline class); production probes a PRE-BUILT index — "
        "s10_bm25_topk, the direct-scan face, IS benched"
    ),
    "st16_stream_bm25_probe": (
        "declared face re-builds the postings index AND replays the "
        "two-chunk file stream with a mid-stream append inline every "
        "run (the st15 rebuild-inline class); production streams "
        "against a PRE-BUILT index"
    ),
}

# Optional subset filter for targeted scale points (e.g. the sf10 growth
# run benches only the heavy/real-work queries): comma-separated names.
_SUBSET = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
if _SUBSET:
    _want = {s.strip() for s in _SUBSET.split(",") if s.strip()}
    _unknown = _want - set(HEADLINE)
    if _unknown:
        raise SystemExit(f"bench: unknown queries in SPARK_GRAFT_BENCH_QUERIES: {sorted(_unknown)}")
    HEADLINE = [n for n in HEADLINE if n in _want]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def time_query(spark, name: str) -> float:
    fn = workload.QUERIES[name]
    # toArrow, not collect (per-row Python objects) and not toPandas
    # (a second, pandas-side materialization DuckDB's fetch never
    # pays): matched-destination transfer — see module docstring
    fn(spark, SF_DIR).toArrow()  # per-query warm-up (plan, codegen, IO cache)
    samples = []
    for _ in range(RUNS):
        spark.catalog.clearCache()  # release intermediates persisted by
        t0 = time.perf_counter()    # dedup ops — each run pays its own cost
        fn(spark, SF_DIR).toArrow()
        samples.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    # broadcast/state hygiene: ContextCleaner reclaims broadcasts only on
    # JVM GC, which a 16g heap may not trigger for minutes — observed as
    # multi-second pauses landing on later queries' medians
    spark.sparkContext._jvm.System.gc()
    # min, not median: the per-query capability floor. Medians on this
    # shared box absorb GC/neighbor noise an order of magnitude larger
    # than the query itself (observed 51s median for a steady 1.6s query).
    return min(samples)


def measure_floor(spark) -> float:
    """Fixed per-query overhead on this machine: min wall-clock of a
    1-row parquet scan fetched via toArrow. Any real query pays at
    least this much regardless of data scanned; complex plans pay more
    (analysis is plan-size-proportional), so this is a conservative
    lower bound for the BASELINE.md gate."""
    fn = lambda: workload.load(spark, SF_DIR, "region").limit(1).toArrow()  # noqa: E731
    for _ in range(3):  # enough warm-up that the START floor is not
        fn()            # JIT-inflated vs the end-of-run re-probe
    samples = []
    for _ in range(max(RUNS, 3)):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main() -> None:
    # Noise evidence (VERDICT r9 item 3): BENCH_r09's driver run was a
    # uniform ~1.77x of a same-code local pair — a box-load signature
    # that cost a round a clean regression read. Stamp the host load
    # (1/5/15-min averages) at start and end, and re-probe the fixed
    # per-query floor at the END of the run: floor_end/floor_sec > 1.5
    # means the box got loaded mid-run and the artifact flags itself.
    load_start = os.getloadavg()
    spark = build_session(app_name="etlbigdata_spark_bench", master=f"local[{CPUS}]")
    # Global JIT warm-up: run a scan-heavy agg a few times so the first
    # *measured* query isn't paying HotSpot compilation for the whole
    # Spark stack (observed: 20×+ inflation on the first heavy query).
    for _ in range(3):
        try:
            workload.q01_pricing_summary(spark, SF_DIR).collect()
        except Exception:
            break
    floor = round(measure_floor(spark), 4)
    timings = {}
    for name in HEADLINE:
        try:
            timings[name] = round(time_query(spark, name), 4)
        except Exception as exc:  # a broken query should not zero the bench
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = None
    ok = [v for v in timings.values() if v is not None]
    total = round(sum(ok), 4)
    floor_end = round(measure_floor(spark), 4)
    load_end = os.getloadavg()
    drift = round(floor_end / floor, 2) if floor > 0 else None
    print(
        json.dumps(
            {
                "metric": "headline_suite_total_wallclock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "runs_per_query": RUNS,
                "n_queries": len(ok),
                "floor_sec": floor,
                "floor_end_sec": floor_end,
                "floor_drift": drift,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in load_end],
                "logical_cpus": os.cpu_count(),
                # read-rule (BASELINE.md): a run with noisy_window=true
                # must not be read as a regression signal — re-pair it.
                # Floor drift catches load ARRIVING mid-run (one-sided:
                # a fresh JVM's start floor always reads warmer by the
                # end, so end<start is normal, not noise; mid-run loadavg
                # sampling is useless here — the bench's own local[32]
                # work dominates the 1-min average, so only the START
                # reading and the floor re-probe carry signal).  A box
                # ALREADY loaded at the start shows in loadavg_start:
                # r10's artifact of record read load 6.79 under the old
                # cores/4=8 trip wire yet inflated untouched queries
                # 2-7x; the start-load rule now lives in ONE place
                # (benchutil.noisy_start — cpus/8, scaled by
                # os.cpu_count(), ADVICE r10) shared with every pair
                # runner in scripts/.
                "noisy_window": bool(
                    (drift is not None and drift > 1.5)
                    or noisy_start(load_start)
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
