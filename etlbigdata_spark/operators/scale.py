"""Scale-out tooling: skew mitigation and co-located (bucketed) joins.

The reference (a driver-resident pandas pipeline, ``simple_etl.py``)
has no notion of data skew or partitioning; these helpers are the
100 TB-design counterparts for the two places a distributed plan
degrades — a shuffle key with a hot value (one straggler task) and a
repeated large-large join that reshuffles both sides every query.

AQE already mitigates *moderate* skew at runtime
(``spark.sql.adaptive.skewJoin``); these are for the pathological cases
AQE can't split (a single group key with >2 GB of rows in an
aggregation, or a join key AQE can't subdivide because the build side
is not splittable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Aggregates that decompose into (partial over salted groups, final
# merge): fn name -> (partial fn, merge fn). COUNT merges with SUM;
# AVG must be expressed as SUM/COUNT by the caller (non-algebraic as
# a single column).
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` is ``[(col, fn, alias)]`` with ``fn`` in sum/count/min/max
    (the algebraic aggregates that decompose losslessly).  Stage 1
    aggregates on ``keys + salt`` — the hot key's rows spread over
    ``salt_buckets`` tasks instead of one straggler — stage 2 merges the
    per-salt partials on ``keys`` alone, touching only
    |groups|×salt_buckets rows.

    For uniform data Spark's own partial aggregation (map-side combine)
    already does this implicitly per PARTITION; explicit salting matters
    when a single group exceeds what one reduce task should hold — the
    per-task work is bounded by 1/salt_buckets of the hot group
    regardless of how the input was partitioned.
    """
    for _, fn, _ in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{fn!r} is not algebraic; express it via sum/count")
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    partial = df.select(*keys, salt, *[F.col(c) for c, _, _ in aggs]).groupBy(
        *keys, "__salt"
    )
    partial = partial.agg(
        *[_ALGEBRAIC[fn][0](c).alias(f"__p_{alias}") for c, fn, alias in aggs]
    )
    final = partial.groupBy(*keys).agg(
        *[_ALGEBRAIC[fn][1](f"__p_{alias}").alias(alias) for _, fn, alias in aggs]
    )
    return final


def salted_skew_join(
    large: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``large`` has hot join-key values and ``small`` is
    too big to broadcast: salt the large side (random 0..N-1), replicate
    the small side N times (one row per salt), join on keys+salt.  The
    hot key's rows land in N different shuffle partitions instead of
    one; the cost is an N× blow-up of the SMALL side only.

    Prefer ``F.broadcast(small)`` when the small side fits (no shuffle at
    all), and plain join + AQE skew-join for moderate skew; this is the
    explicit fallback for the regime in between.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # replicating the small side breaks right/full/cross semantics
        # (unmatched small rows would appear once per salt)
        raise ValueError(f"salted_skew_join does not support how={how!r}")
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_large.join(replicated_small, keys + ["__salt"], how)
    return out.drop("__salt")


def top_frequent_keys(df: DataFrame, keys: list[str], top_n: int = 10) -> DataFrame:
    """Skew diagnostic: the heaviest key values and their row counts —
    run before choosing a join/agg strategy (one pass, map-side
    combined)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc())
        .limit(top_n)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    n_buckets: int = 32,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist a table bucketed (and optionally sorted) by join key.

    Two tables bucketed the same way join with NO exchange on either
    side (and no sort, if ``sort_keys`` match): the co-located join that
    turns a repeated large-large shuffle into a local zip per bucket.
    Uses the metastore writer (``saveAsTable``) because bucketing
    metadata lives in the catalog, not the parquet files.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, keys: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs
    the plan contains no Exchange (verify with ``.explain`` — the scan
    reports ``SelectedBucketsCount`` and the join inputs are
    exchange-free)."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)
