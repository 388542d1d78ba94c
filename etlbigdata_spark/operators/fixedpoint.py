"""Exact fixed-point money aggregation on LONGS (round 8, VERDICT item 2).

Why this module exists: Spark's decimal arithmetic leaves the
whole-stage-codegen fast path as soon as an expression's precision
exceeds the long-backed limit (18 digits) — ``decimal(18,4) ×
decimal(18,4)`` is ``decimal(37,8)``, so every per-row product in a
money aggregate allocates through the BigDecimal slow path.  Measured
at sf10 (59 M rows post-filter, ``AB_SF10_r08.json`` / BASELINE.md
round-8 notes): the q01 pricing summary runs 0.70 s with double
arithmetic, 3.3-5.4 s with decimal — ~80% of the query is decimal
overhead, not scan or shuffle.  DuckDB runs the same decimal SQL in
0.37 s because its fixed-point kernels multiply int64/int128 natively.

This module does on Spark what DuckDB does internally: encode ≤2dp
money columns as SCALED LONGS (price → round(price·100)), do products
and sums in long arithmetic (codegen, vectorized, no allocation), and
convert to decimal/double ONCE on the handful of output rows.  Same
exact rational value at every step, so results are BIT-EXACT vs the
decimal formulation (pinned by tests at sf0.1 and by the DuckDB oracle
hash at sf0.01 uniform + skewed): q01 2.1 s vs 5.4 s and q05 6.3 s vs
9.6 s in the same paired session.

ENCODE PATH (round 9): ``F.round`` on DoubleType is ITSELF the
BigDecimal slow path (Spark's Round allocates per row), so the encode
is a truncating cast — ``(scaled + signum(scaled)·0.5)::long`` — which
equals HALF_UP for every on-grid input (an off-grid input raises via
the guard; the 0.5 boundary is unreachable under the ≤1e-3 grid
tolerance).  Kernel A/B at sf10, 60 M rows, min-of-5 interleaved
(``AB_GUARD_r09.json``): decimal 2.55 s, r8 round-encode guarded
1.86 s, cast-encode unguarded 0.265 s, cast-encode guarded 0.316 s.

EXACTNESS PRECONDITION: inputs must be exactly representable at the
stated scale (TPC-H money/discount/tax are 2dp by spec; the testdata
measures ≤1e-9 from 2dp, i.e. binary representation error only).
``F.round`` HALF_UP on the shortest-decimal repr then recovers the
exact scaled integer because the product's binary error (≤1e-7 for
values ≤1e7) never reaches the 0.5 rounding boundary.  For data with
finer scale, raise ``dp`` or fall back to the decimal formulation.

OVERFLOW BOUNDS (the trade for codegen speed — stated, not silent):
a scale-4 product (price2 × pct2 ≤ ~1.05e9) sums safely to ~8.8e9
rows PER GROUP before reaching Long.MaxValue; the scale-6 charge term
is decomposed as ``100·Σterm4 + Σ(term4·tax2)`` so each partial sum
keeps ≥10× headroom at sf100 (6e8 rows).  Beyond ~1e9 rows per group,
salt the group key (operators/scale.py) or keep the decimal face —
the bound is per-GROUP, so the 100 TB regime with realistic group
cardinalities stays in range long before one group holds a billion
rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_long(col: Column | str, dp: int = 2, validate: bool = True) -> Column:
    """Encode an exactly-``dp``-decimal double column as an unscaled
    long: ``round(col · 10^dp)``.  Exact under the module precondition
    (see module docstring); the round absorbs the input's binary
    representation error.

    ``validate=True`` (default) makes the precondition LOUD instead of
    assumed: a value further than 1e-3 from its ``dp``-decimal grid
    (i.e. genuinely finer-grained data, not binary noise — true-``dp``
    doubles measure ≤1e-9 off-grid) raises through ``F.raise_error``
    at scan time rather than silently rounding revenue.  Guard cost,
    measured (round 9, ``AB_GUARD_r09.json``, the numbers that
    supersede the round-8 "noise band" claim): the deviation branch —
    which REUSES the encoded long, no second rounding — adds ~19% to
    the pure encode+sum kernel, 0.316 vs 0.265 s over 60 M rows at
    sf10, i.e. ~0.05 s per 60 M rows.  Kept ON by default: loud beats
    wrong, and the cost is sub-noise in any query that also joins or
    shuffles.  Pass ``validate=False`` only in a pipeline that already
    proved the scale upstream."""
    c = F.col(col) if isinstance(col, str) else col
    scaled = c * (10 ** dp)
    # HALF_UP without F.round: Round(DoubleType) allocates a BigDecimal
    # per row — the exact slow path this module exists to avoid.  The
    # truncating cast is identical for every on-grid input (off-grid
    # raises below / is out of contract for validate=False).  Above
    # 2^52 the +0.5 nudge itself rounds (double spacing ≥ 1) and would
    # shift an exact integer by one (round-9 review, verified at
    # 2^52+1), so that magnitude branch casts directly — every double
    # there is integral, truncation is exact.
    half_up = (scaled + F.signum(scaled) * 0.5).cast("long")
    enc = F.when(F.abs(scaled) < float(2 ** 52), half_up).otherwise(
        scaled.cast("long")
    )
    if not validate:
        return enc
    dev = F.abs(scaled - enc)
    return F.when(
        dev > 1e-3,
        F.raise_error(
            F.concat(
                F.lit(f"fixedpoint.scaled_long: value "),
                c.cast("string"),
                F.lit(f" is not {dp}dp money (off-grid by >1e-3) — "
                      "use the decimal formulation for finer-scaled data"),
            )
        ).cast("long"),
    ).otherwise(enc)


def unscale_to_double(col: Column, scale: int) -> Column:
    """Convert a summed unscaled long back to double THROUGH DECIMAL —
    ``(long / 10^scale)`` as decimal division, then one correctly-
    rounded cast — so the result is bit-identical to
    ``CAST(SUM(decimal...) AS DOUBLE)`` in the oracle formulation.
    Runs on output rows only (a handful), cost-free."""
    return (col.cast(f"decimal(38,{scale + 4})") / (10 ** scale)).cast("double")


def money_times_pct(money_col: Column | str, pct_col: Column | str,
                    negate_pct: bool = False) -> Column:
    """``money · (1 − pct)`` (or ``· (1 + pct)`` with
    ``negate_pct=False`` semantics handled by the caller) as a scale-4
    unscaled long: ``price2 · (100 ∓ pct2)``.  The TPC-H revenue
    term — one long multiply per row instead of a decimal(37,8)
    allocation."""
    p2 = scaled_long(money_col)
    c2 = scaled_long(pct_col)
    factor = (100 - c2) if negate_pct else (100 + c2)
    return p2 * factor
