#!/usr/bin/env python
"""evt03_sessionize sf10 decomposition + A/B session (round-12 brief
item 2, the q21 playbook).

Round-11 state: evt03 at sf10 reads 47.9 s vs DuckDB 11.1 s (4.31x) —
the suite's worst real-work ratio.  The shipped plan is already the
right SHAPE (one shuffle on user_id; the lag window, the running-sum
window, and the per-(user, session) aggregate all share that
partitioning), so the brief's hypothesis is bandwidth per shuffled
byte, not an anti-pattern.  Three candidates, exactly the q21
playbook:

* A (shipped) — select(user_id, ts, event_id, value) -> sessionize ->
  groupBy agg with a per-row ``CAST(value AS DECIMAL(18,4))`` sum.
  The decimal cast + sum is the KNOWN BigDecimal slow path (round 8:
  ~80% of q01 at sf10 was decimal, not scan).
* B (narrow + fixed-point) — encode the shuffled row MAP-SIDE:
  ``ts -> unix_micros`` (long sort key instead of TimestampType) and
  ``value -> scaled_long(value, 4)`` (events.value is exactly 2dp in
  the testdata — verified 0 off-grid rows at sf10 — so the encode is
  exact per operators/fixedpoint.py); windows and the session
  aggregate then run entirely on longs, and the handful of output
  rows decode via ``timestamp_micros`` / ``unscale_to_double`` (the
  q01/q07/q10 discipline).  Same plan shape, narrower bytes, zero
  BigDecimal allocations.
* C (native session windows) — ``groupBy(user_id,
  F.session_window(ts, gap))``: Spark's MergingSessionsExec assigns
  AND aggregates sessions in ONE sorted pass (no lag window, no
  running-sum window — two whole window-operator passes disappear);
  session_idx is recovered by a row_number over the ~50x smaller
  session-level rows, which reuses the user_id partitioning (no extra
  exchange).  Gap semantics: our rule is same-session iff
  ``diff <= 21600 s``; session_window merges iff ``diff < gap``, so
  gap = 21600 s + 1 us makes the two IDENTICAL at integer-microsecond
  resolution (timestamps are stored as epoch-us longs, so no finer
  diff exists).

Result-equality of B and C vs A is asserted at SF_EQ (full collected
frames, canonicalized) before anything is timed.  Timing: one Spark
session, interleaved min-of-RUNS per variant after warm-up, noop-sink
writes for the per-stage decomposition, DuckDB pair in the same
process, loadavg + floor stamps (benchutil noise rule).  Emits
EVT03_DECOMP_r12.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etlbigdata_spark import workload  # noqa: E402
from etlbigdata_spark.benchutil import noisy_start, register_duck_views  # noqa: E402
from etlbigdata_spark.operators import aggregates, fixedpoint as fx  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/scaled/sf10")
SF_EQ = os.environ.get("SPARK_GRAFT_EQ_SF_DIR", "/root/testdata/sf0.01")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
OUT = os.environ.get("EVT03_OUT", "EVT03_DECOMP_r12.json")

GAP_US = 21_600_000_000  # 6 h


def variant_a(spark, sf_dir):
    return workload.evt03_sessionize(spark, sf_dir)


def _narrow_events(spark, sf_dir):
    return workload.load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        fx.scaled_long("value", 4).alias("value4"),
    )


def variant_b(spark, sf_dir):
    ev = _narrow_events(spark, sf_dir)
    sess = aggregates.sessionize(
        ev, ["user_id"], "ts_us", gap_seconds=21600, tiebreakers=["event_id"]
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.timestamp_micros(F.min("ts_us")).alias("session_start"),
        F.timestamp_micros(F.max("ts_us")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        fx.unscale_to_double(F.sum("value4"), 4).alias("sum_value"),
    )


def variant_c(spark, sf_dir):
    ev = workload.load(spark, sf_dir, "events").select(
        "user_id", "ts", fx.scaled_long("value", 4).alias("value4")
    )
    gap = f"{GAP_US + 1} microseconds"  # < gap  ==  <= 21600 s at us grid
    sess = ev.groupBy(
        "user_id", F.session_window(F.col("ts"), gap).alias("win")
    ).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        fx.unscale_to_double(F.sum("value4"), 4).alias("sum_value"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("win.start").asc())
    return sess.withColumn(
        "session_idx", F.row_number().over(w).cast("long")
    ).select(
        "user_id", "session_idx", "session_start", "session_end",
        "n_events", "sum_value",
    )


VARIANTS = {"a_shipped": variant_a, "b_narrow_fixedpoint": variant_b,
            "c_session_window": variant_c}


def canon(df):
    rows = [tuple(r) for r in df.collect()]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return df.columns, rows


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_fn(fn, runs=RUNS):
    fn()  # warm-up
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return round(min(out), 3)


def main():
    load_start = os.getloadavg()
    spark = build_session(app_name="evt03_decomp_r12", master=f"local[{CPUS}]")

    # -- equality gate first (cheap SF): B == A and C == A, full frames
    base_cols, base_rows = canon(variant_a(spark, SF_EQ))
    for name in ("b_narrow_fixedpoint", "c_session_window"):
        cols, rows = canon(VARIANTS[name](spark, SF_EQ))
        assert cols == base_cols, f"{name}: columns {cols} vs {base_cols}"
        assert rows == base_rows, (
            f"{name}: {len(rows)} rows vs {len(base_rows)}; first diff "
            f"{next(((a, b) for a, b in zip(rows, base_rows) if a != b), None)}"
        )
    print("equality gate passed at", SF_EQ, f"({len(base_rows)} rows)")

    res = {"equality_rows": len(base_rows), "sf_eq": SF_EQ, "sf_dir": SF_DIR}

    # -- per-stage decomposition of the shipped plan (noop sink)
    ev_a = lambda: workload.load(spark, SF_DIR, "events").select(  # noqa: E731
        "user_id", "ts", "event_id", "value")
    stages = {
        "a1_scan_project": lambda: noop(ev_a()),
        "a2_plus_sessionize": lambda: noop(aggregates.sessionize(
            ev_a(), ["user_id"], "ts", gap_seconds=21600,
            tiebreakers=["event_id"])),
        "a3_full": lambda: noop(variant_a(spark, SF_DIR)),
        "b1_scan_project": lambda: noop(_narrow_events(spark, SF_DIR)),
        "b2_plus_sessionize": lambda: noop(aggregates.sessionize(
            _narrow_events(spark, SF_DIR), ["user_id"], "ts_us",
            gap_seconds=21600, tiebreakers=["event_id"])),
        "b3_full": lambda: noop(variant_b(spark, SF_DIR)),
        "c3_full": lambda: noop(variant_c(spark, SF_DIR)),
    }
    res["stages_noop_sec"] = {k: time_fn(fn) for k, fn in stages.items()}

    # -- end-to-end pairs (toPandas fetch, bench protocol)
    res["spark_sec"] = {
        name: time_fn(lambda fn=fn: fn(spark, SF_DIR).toPandas())
        for name, fn in VARIANTS.items()
    }

    import duckdb
    con = duckdb.connect()
    register_duck_views(con, SF_DIR)
    sql = workload.ORACLE_SQL["evt03_sessionize"]
    res["duckdb_sec"] = time_fn(lambda: con.sql(sql).fetchall())
    res["ratio_vs_duckdb"] = {
        k: round(v / res["duckdb_sec"], 2) for k, v in res["spark_sec"].items()
    }
    res["loadavg_start"] = [round(x, 2) for x in load_start]
    res["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    res["noisy_window"] = noisy_start(load_start)
    res["runs_per_point"] = RUNS
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
