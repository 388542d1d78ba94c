#!/usr/bin/env python
"""Round-8 growth benches (VERDICT items 3 and 4).

Subcommands:

* ``d09sf1`` — PRODUCTION semantic dedup at sf1 (20 k × 64-d
  embeddings): k-means centroids with the cell count scaled ∝ √n
  (SemDeDup's web-scale discipline — cells stay ~√n vectors so the
  within-cell O(Σ|cell|²) pair scan stays ~linear overall), scored
  through the vectorized BLAS path.  Records the one-time fit cost,
  the per-pass dedup cost (min of 3), and the plan invariant the pytest
  pin asserts at small scale: ONE exchange, keyed on the cell id.
  The 8-cell d09 oracle face is untouched — it exists so DuckDB can
  replay the exact algorithm; THIS is the shape you run at scale.

* ``st11sf10`` — continuous-aggregate maintenance at sf10 (10 M
  events): the rollup grows batch over batch while per-batch sink cost
  must follow TOUCHED PARTITIONS, not rollup size
  (rollup_merge_sink(partition_col=...) dynamic partition overwrite).
  Events are range-partitioned by timestamp into 8 files and drained
  with maxFilesPerTrigger=1, so each micro-batch touches a bounded
  time slice as the rollup accumulates the whole history.  Records
  per-batch wall-clock + rollup row count after each batch: flat batch
  cost against a growing rollup IS the invariant (re-asserted here at
  10× the round-6 scale).

d07 at sf10 reuses the round-6 harness unchanged:
``python scripts/ab_round6.py d07sf1 /tmp/sfscale/sf10``.

Usage: python scripts/bench_growth_r08.py [d09sf1|st11sf10] [sf_dir]
Appends one JSON line per run to GROWTH_r08.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etlbigdata_spark import workload
from etlbigdata_spark.session import build_session

EXP = sys.argv[1] if len(sys.argv) > 1 else "d09sf1"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else (
    "/tmp/sfscale/sf1" if EXP == "d09sf1" else "/tmp/sfscale/sf10"
)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "GROWTH_r08.json")


def emit(obj: dict) -> None:
    line = json.dumps(obj)
    print(line)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def d09sf1(spark) -> None:
    import math
    import re

    from etlbigdata_spark.functions import similarity as fsim

    emb = workload.load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    k = int(round(math.sqrt(n)))  # cells ∝ √n — the SemDeDup scaling rule

    t0 = time.perf_counter()
    cents, _, _ = fsim.kmeans_fit(emb, k=k, iters=2)
    fit_sec = round(time.perf_counter() - t0, 3)

    def run():
        return fsim.semantic_dedup_pairs(
            emb, centroids=cents, threshold=0.99, vectorized=True, assign="blas"
        )

    run().count()  # warm
    secs, n_pairs = [], 0
    for _ in range(3):
        t0 = time.perf_counter()
        n_pairs = run().count()
        secs.append(round(time.perf_counter() - t0, 3))

    pairs = run()
    pairs.collect()
    plan = pairs._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,)]*)", plan)
    emit({
        "exp": "d09_semantic_sf1_kmeans_scaled", "sf_dir": SF_DIR,
        "n_vectors": n, "n_cells": k, "kmeans_fit_sec": fit_sec,
        "dedup_pass_sec": secs, "min_dedup_pass": min(secs),
        "pairs_found": n_pairs,
        "plan_one_shuffle_on_cell_id": (
            len(exchanges) == 1 and exchanges[0].startswith("cluster")
        ),
        "note": "fit is a one-time index cost; the pass is the per-corpus-scan cost",
    })


def st11sf10(spark) -> None:
    import shutil
    import tempfile

    from etlbigdata_spark.streaming import ops as stops
    from etlbigdata_spark.workload import D

    events = workload.load(spark, SF_DIR, "events")
    n = events.count()
    base = tempfile.mkdtemp(prefix="st11g_")
    src, rollup, ckpt = f"{base}/src", f"{base}/rollup", f"{base}/ckpt"
    # 8 time-contiguous files -> 8 micro-batches, each touching a
    # bounded day range while the rollup accumulates all history
    events.repartitionByRange(8, "ts").sortWithinPartitions("ts").write.parquet(src)

    stream = stops.read_file_stream(
        spark, src, events.schema, max_files_per_trigger=1
    ).withColumn("value", D("value"))
    agg = stops.tumbling_counts(
        stream, "ts", "1 hour", keys=["event_type"], value_col="value"
    ).withColumn("day", F.to_date("window_start"))

    inner = stops.rollup_merge_sink(
        rollup, keys=["window_start", "event_type"], partition_col="day"
    )
    batch_secs: list[float] = []
    rollup_rows: list[int] = []

    def timed_sink(df, epoch_id):
        t0 = time.perf_counter()
        inner(df, epoch_id)
        batch_secs.append(round(time.perf_counter() - t0, 3))
        rollup_rows.append(spark.read.parquet(rollup).count())

    try:
        stops.run_available_now(
            stops.write_stream_foreach_batch(agg, timed_sink, output_mode="update"),
            ckpt,
        )
        final_rows = spark.read.parquet(rollup).count()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    emit({
        "exp": "st11_rollup_growth_sf10", "sf_dir": SF_DIR, "n_events": n,
        "n_batches": len(batch_secs), "per_batch_sec": batch_secs,
        "rollup_rows_after_each_batch": rollup_rows,
        "final_rollup_rows": final_rows,
        "last_over_first_batch_cost": (
            round(batch_secs[-1] / batch_secs[0], 2) if batch_secs else None
        ),
        "note": "invariant: per-batch cost follows touched partitions, "
                "not rollup size — flat cost against a growing rollup",
    })


def main() -> None:
    spark = build_session(app_name=f"growth_r08_{EXP}")
    {"d09sf1": d09sf1, "st11sf10": st11sf10}[EXP](spark)


if __name__ == "__main__":
    main()
