"""Data-quality checks (expectations): declarative rules → one report.

ETL pipelines gate loads on data-quality assertions (the reference has
no equivalent — its only validation is the implicit all-strings rescue
on CSV parse failure, ``simple_etl.py:168-169``). This module gives the
engine a dbt-test-style surface: build rules with the small helpers,
run them ALL in a single aggregate pass over the table (one scan, one
1-row partial-agg reduction — no per-rule jobs), and get a long-format
report (rule, n_violations, passed) ready to gate on or append to a
quality log.

NULL semantics: per-row value rules (``in_range``/``accepted_values``/
``matches``) treat NULL as PASSING — nullability is asserted explicitly
with ``not_null`` — so each rule tests exactly one property.
``unique`` counts rows beyond the first per key (duplicates), via
count − count-distinct in the same aggregate (Spark's expand path; at
100 TB swap in approx_count_distinct for a bounded-error gate if the
exact expand dominates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a rule is (name, payload): payload is a boolean Column (per-row rule)
# or a list of key column names (uniqueness rule)
Rule = tuple[str, "Column | list[str]"]


def not_null(col: str) -> Rule:
    return (f"not_null:{col}", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return (f"in_range:{col}", F.col(col).between(lo, hi))


def accepted_values(col: str, values: list) -> Rule:
    return (f"accepted_values:{col}", F.col(col).isin(*values))


def matches(col: str, pattern: str) -> Rule:
    return (f"matches:{col}", F.col(col).rlike(pattern))


def expression(name: str, predicate: Column) -> Rule:
    """Escape hatch: any boolean Column as a named rule."""
    return (name, predicate)


def unique(*cols: str) -> Rule:
    return (f"unique:{','.join(cols)}", list(cols))


def run_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, n_violations, passed) — all rules in ONE aggregate pass."""
    if not rules:
        raise ValueError("no rules given")
    aggs = []
    for name, payload in rules:
        if isinstance(payload, list):
            keys = F.struct(*payload) if len(payload) > 1 else F.col(payload[0])
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(keys)).cast("long").alias(name)
            )
        else:
            # NULL predicate = pass (see module docstring). The outer
            # coalesce makes an EMPTY table vacuously pass: SUM over zero
            # rows is NULL, which would otherwise read as "None violations"
            # and fail assert_checks on e.g. an empty micro-batch (st10).
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(F.coalesce(payload, F.lit(True)), F.lit(0)).otherwise(F.lit(1))
                    ),
                    F.lit(0),
                ).cast("long").alias(name)
            )
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("rule"), F.col(name).alias("n_violations"))
            for name, _ in rules
        ]
    )
    return (
        row.select(F.explode(pairs).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.n_violations").alias("n_violations"),
            (F.col("r.n_violations") == 0).alias("passed"),
        )
    )


def assert_checks(df: DataFrame, rules: list[Rule]) -> None:
    """Gate form: raise ``ValueError`` listing every failing rule."""
    failing = [
        (r["rule"], r["n_violations"])
        for r in run_checks(df, rules).collect()
        if not r["passed"]
    ]
    if failing:
        detail = ", ".join(f"{n} ({v} violations)" for n, v in failing)
        raise ValueError(f"data-quality checks failed: {detail}")


def flag_outliers(
    df: DataFrame,
    column: str,
    by: list[str],
    k: float = 1.5,
    round_bounds: int | None = 6,
) -> DataFrame:
    """Tukey IQR outlier flags per group: adds ``is_outlier`` where the
    value falls outside [q1 − k·IQR, q3 + k·IQR] of its group.

    Exact continuous-interpolation percentiles (cross-engine-stable,
    same order statistic as DuckDB's quantile_cont — see b28); the
    per-group bounds table is group-count-sized, so the join back is a
    broadcast at any realistic cardinality. ``round_bounds`` rounds the
    bounds before comparison so engines computing the quantile in a
    different operation order cannot flip borderline rows. At 100 TB
    swap the exact percentile for ``approx_percentile`` (mergeable GK
    sketch) when rank error is tolerable — the shape is identical.
    """
    x = F.col(column)
    q = df.groupBy(*by).agg(
        F.percentile(column, 0.25).alias("__q1"),
        F.percentile(column, 0.75).alias("__q3"),
    )
    # groupBy emits a null-key bounds row, so the join back must match it
    # null-safely — a plain equi-join on the names would silently DROP every
    # null-group input row instead of flagging it.
    q = q.select(
        *[F.col(c).alias(f"__g_{c}") for c in by], "__q1", "__q3"
    )
    from functools import reduce

    # F.lit(True) seed keeps by=[] working (global bounds: the 1-row
    # aggregate cross-joins every row, same as the old equi-join-on-[])
    cond = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__g_{c}")) for c in by],
        F.lit(True),
    )
    lo = F.col("__q1") - k * (F.col("__q3") - F.col("__q1"))
    hi = F.col("__q3") + k * (F.col("__q3") - F.col("__q1"))
    if round_bounds is not None:
        lo, hi = F.round(lo, round_bounds), F.round(hi, round_bounds)
    return (
        df.join(F.broadcast(q), cond)
        .withColumn("is_outlier", (x < lo) | (x > hi))
        .drop("__q1", "__q3", *[f"__g_{c}" for c in by])
    )


def psi_report(
    reference: DataFrame,
    current: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard data-drift monitor (PSI < 0.1 stable,
    0.1–0.25 moderate shift, > 0.25 investigate): per equi-width bucket
    ``(p_cur − p_ref) · ln(p_cur / p_ref)``, epsilon-smoothed so an
    empty bucket contributes a finite term instead of ±∞.

    Buckets use :func:`operators.sampling.histogram`'s arithmetic
    (floor((x−lo)/width), out-of-range clamped to sentinel buckets
    −1/n_bins, NULLs dropped) — IEEE-identical across engines, so an
    external SQL twin reproduces every term.  Each side is ONE
    count-aggregate pass (n_bins+2 partials regardless of table size);
    the bucket join is bins-sized.  Terms and the total are 6-dp
    rounded: ln's last-ulp libm variance is ~1e-16 per term, orders
    below the rounding quantum.

    Returns per-bucket rows ``(bucket, p_ref, p_cur, psi_term)`` —
    total PSI = SUM(psi_term), left to the caller/report so the
    per-bucket attribution (WHICH range drifted) stays visible."""
    import math

    from .sampling import histogram

    if epsilon <= 0:
        raise ValueError(f"need epsilon > 0, got {epsilon}")
    # ONE scan per side: the histogram aggregate IS the only corpus-
    # sized work, and its (n_bins+2)-row result is driver-sized by
    # construction — totals, proportions and the PSI terms are plain
    # arithmetic over it (a separate count() per side would double the
    # scans for numbers the buckets already carry)
    h_ref = {r["bucket"]: r["n_rows"] for r in histogram(reference, column, lo, hi, n_bins).collect()}
    h_cur = {r["bucket"]: r["n_rows"] for r in histogram(current, column, lo, hi, n_bins).collect()}
    ref_n, cur_n = sum(h_ref.values()), sum(h_cur.values())
    if ref_n == 0 or cur_n == 0:
        raise ValueError(f"empty side: reference={ref_n}, current={cur_n} non-null rows")
    def _r6(x: float) -> float:
        # half-AWAY-from-zero like SQL round() — Python's round is
        # half-even and would diverge from the oracle on exact ties
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    rows = []
    for b in sorted(set(h_ref) | set(h_cur)):
        p_ref = h_ref.get(b, 0) / float(ref_n)
        p_cur = h_cur.get(b, 0) / float(cur_n)
        pr, pc = max(p_ref, epsilon), max(p_cur, epsilon)
        rows.append(
            (int(b), _r6(p_ref), _r6(p_cur), _r6((pc - pr) * math.log(pc / pr)))
        )
    return reference.sparkSession.createDataFrame(
        rows, "bucket int, p_ref double, p_cur double, psi_term double"
    )
