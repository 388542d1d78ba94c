#!/usr/bin/env python
"""Round-9 fixed-point guard kernel A/B (VERDICT r8 item 5).

Round 8 shipped two contradictory claims about scaled_long's
validate=True cost: the docstring said "same A/B noise band", BASELINE
recorded a paired kernel A/B of 1.79 vs 1.17 s at sf10 (~53%).  This
script re-measures the kernel — the q01-shaped revenue aggregate over
sf10 lineitem (~60 M rows) — across five formulations, interleaved so
machine drift hits all variants equally:

  decimal          SUM(price * (1-disc)) in decimal(18,4) arithmetic
  round_unguarded  r8 scaled-long, F.round-based encode, no guard
  round_guarded    r8 shipped face: F.round encode + second F.round in
                   the deviation branch (the 53%-overhead suspect —
                   Spark's Round on DoubleType allocates a BigDecimal
                   PER ROW, and the guard doubles it)
  cheap_unguarded  truncating cast encode: (x + signum(x)*0.5)::long —
                   bit-identical to HALF_UP for every on-grid input,
                   no BigDecimal anywhere
  cheap_guarded    cheap encode + deviation branch REUSING the encoded
                   long (no second rounding) — the round-9 candidate

Also asserts all five return the IDENTICAL sum on the full sf10 data
before timing anything.  Emits AB_GUARD_r09.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etlbigdata_spark.operators import fixedpoint
from etlbigdata_spark.session import build_session
from etlbigdata_spark.workload import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfscale/sf10")
RUNS = 5


def _raise(c):
    return F.raise_error(
        F.concat(F.lit("off-grid money: "), c.cast("string"))
    ).cast("long")


def _round_enc(c, dp=2):
    scaled = c * (10 ** dp)
    return F.round(scaled).cast("long")


def _round_guarded(c, dp=2):
    scaled = c * (10 ** dp)
    enc = F.round(scaled).cast("long")
    dev = F.abs(scaled - F.round(scaled))
    return F.when(dev > 1e-3, _raise(c)).otherwise(enc)


# the cheap faces ARE the shipped implementation — import, don't copy,
# so a future scaled_long change keeps this A/B measuring production
# code (the round-encode faces above are deliberately frozen copies of
# the superseded round-8 formulation)
def _cheap_enc(c, dp=2):
    return fixedpoint.scaled_long(c, dp=dp, validate=False)


def _cheap_guarded(c, dp=2):
    return fixedpoint.scaled_long(c, dp=dp, validate=True)


def _rev(enc_fn):
    p = enc_fn(F.col("l_extendedprice"))
    d = enc_fn(F.col("l_discount"))
    return F.sum(p * (100 - d)).alias("rev4")


VARIANTS = {
    "decimal": lambda li: li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev")
    ),
    "round_unguarded": lambda li: li.agg(_rev(_round_enc)),
    "round_guarded": lambda li: li.agg(_rev(_round_guarded)),
    "cheap_unguarded": lambda li: li.agg(_rev(_cheap_enc)),
    "cheap_guarded": lambda li: li.agg(_rev(_cheap_guarded)),
}


def main() -> None:
    spark = build_session(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")

    def li():
        # rebuild per run: re-collecting a prebuilt Dataset reuses
        # materialized AQE query stages (round-8 measurement trap)
        return load(spark, SF_DIR, "lineitem").select(
            "l_extendedprice", "l_discount"
        )

    # equivalence gate: the four long faces must agree exactly; decimal
    # must agree after unscaling
    sums = {}
    for name, fn in VARIANTS.items():
        row = fn(li()).first()
        sums[name] = row[0]
    longs = {k: int(v) for k, v in sums.items() if k != "decimal"}
    assert len(set(longs.values())) == 1, f"long faces disagree: {longs}"
    dec4 = int(sums["decimal"].scaleb(4))
    assert dec4 == next(iter(longs.values())), (dec4, longs)

    results: dict = {"sf_dir": SF_DIR, "runs": RUNS, "times": {}}
    for _ in range(RUNS):
        for name, fn in VARIANTS.items():
            t0 = time.perf_counter()
            fn(li()).toPandas()
            results["times"].setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
    results["min"] = {k: min(v) for k, v in results["times"].items()}
    base = results["min"]["round_unguarded"]
    results["overhead_vs_round_unguarded"] = {
        k: round(v / base - 1, 3) for k, v in results["min"].items()
    }
    cheap = results["min"]["cheap_unguarded"]
    results["cheap_guard_overhead"] = round(
        results["min"]["cheap_guarded"] / cheap - 1, 3
    )
    line = json.dumps(results)
    print(line)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "AB_GUARD_r09.json",
    )
    with open(out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
