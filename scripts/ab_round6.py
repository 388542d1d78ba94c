#!/usr/bin/env python
"""Round-6 same-session A/B evidence runs (VERDICT r5 items 3, 6, 8).

All measurements in ONE Spark session, alternating variants, so the
numbers are same-session pairs (the only signal on this box — see
BASELINE.md's noise protocol).  Prints one JSON line per experiment.

Experiments:
  d04ab   — simhash banded-join candidate_join: sort_merge vs
            shuffle_hash, alternating runs at sf1 (item 3)
  d07sf1  — incremental dedup at sf1 with the index-build vs
            batch-probe split, against a PRE-BUILT parquet index —
            the production 100 TB shape (item 6)
  d02mem  — d02 shuffle-hash under constrained memory (item 8):
            run in a SEPARATE constrained session; see --mem flag

Usage: python scripts/ab_round6.py [d04ab|d07sf1|d02mem] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.functions import dedup as fdedup  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402

EXP = sys.argv[1] if len(sys.argv) > 1 else "d04ab"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale/sf1"


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 3), n


def d04ab(spark):
    from pyspark.sql import functions as F

    docs = workload.load(spark, SF_DIR, "documents")
    results = {"sort_merge": [], "shuffle_hash": []}
    pair_counts = {}

    def run(variant):
        fdedup.release_cached()
        out = fdedup.simhash_near_dups(
            docs, "doc_id", "text", max_hamming=3, counter_bits=16,
            candidate_join=variant,
        )
        sec, n = timed(lambda: out.count())
        results[variant].append(sec)
        pair_counts[variant] = n

    # warm-up (scan cache, JIT) then 3 alternating pairs
    run("sort_merge"); results["sort_merge"].clear()
    for _ in range(3):
        run("sort_merge")
        run("shuffle_hash")
    print(json.dumps({
        "exp": "d04_candidate_join_ab", "sf_dir": SF_DIR,
        "sort_merge_sec": results["sort_merge"],
        "shuffle_hash_sec": results["shuffle_hash"],
        "min_sort_merge": min(results["sort_merge"]),
        "min_shuffle_hash": min(results["shuffle_hash"]),
        "pairs_equal": len(set(pair_counts.values())) == 1,
        "pairs": pair_counts,
    }))


def d07sf1(spark):
    from pyspark.sql import functions as F

    docs = workload.load(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    base = os.path.basename(SF_DIR.rstrip("/"))
    index_path = f"/tmp/sfscale/minhash_index_{base}.parquet"

    # index build: one-time cost the production pipeline amortizes
    def build():
        sig = fdedup.minhash_signatures(corpus, "doc_id", "text", shingle_n=3)
        sig.write.mode("overwrite").parquet(index_path)
        return 0

    build_secs = []
    for _ in range(3):
        s, _n = timed(build)
        build_secs.append(s)

    # batch probe against the PRE-BUILT index: the per-batch cost
    index = spark.read.parquet(index_path)
    probe_secs, counts = [], []
    for _ in range(3):
        s, n = timed(lambda: fdedup.incremental_minhash_pairs(
            batch, index, "doc_id", "text", bands=16,
            jaccard_distance_threshold=0.5,
        ).count())
        probe_secs.append(s); counts.append(n)

    # plan assertion at this scale: the corpus/index side must not
    # exchange (broadcast batch streams through it)
    plan = (
        fdedup.incremental_minhash_pairs(batch, index, "doc_id", "text", bands=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    idx_scan_to_first_exchange = plan  # textual check below
    n_exchanges = plan.count("Exchange")
    has_bcast = "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    print(json.dumps({
        "exp": "d07_incremental_sf1", "sf_dir": SF_DIR,
        "index_build_sec": build_secs, "min_index_build": min(build_secs),
        "batch_probe_sec": probe_secs, "min_batch_probe": min(probe_secs),
        "candidate_pairs": counts[0],
        "plan_broadcast_join": has_bcast,
        "plan_exchange_count": n_exchanges,
    }))


def d02mem(spark):
    docs = workload.load(spark, SF_DIR, "documents")
    fdedup.release_cached()
    out = fdedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2, max_doc_freq=50
    )
    sec, n = timed(lambda: out.count())
    print(json.dumps({
        "exp": "d02_constrained_memory", "sf_dir": SF_DIR,
        "driver_memory": os.environ.get("AB_DRIVER_MEM", "(default)"),
        "sec": sec, "pairs": n,
    }))


def main():
    extra = {}
    if EXP == "d02mem":
        extra = {"spark.driver.memory": os.environ.get("AB_DRIVER_MEM", "2g")}
    spark = build_session(app_name=f"ab_round6_{EXP}", extra_conf=extra)
    {"d04ab": d04ab, "d07sf1": d07sf1, "d02mem": d02mem}[EXP](spark)


if __name__ == "__main__":
    main()
