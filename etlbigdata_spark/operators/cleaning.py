"""Cleaning / reshaping transforms — reference parity (SURVEY §2 Part A).

Each function re-expresses one Transform-stage click of the reference
(`/root/reference/simple_etl.py`) as a pure DataFrame → DataFrame
transform.  None of them materialize: the reference's per-click
``toPandas()`` round-trip (``simple_etl.py:197`` et al.) is gone, so a
chained pipeline fuses into one Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CAST_TYPES = {
    # Ref exposes exactly four types (simple_etl.py:294,298-305). Float is
    # widened to double (Spark's default fractional); extras beyond the ref
    # cover the driver testdata (timestamps, longs, decimals).
    "string": T.StringType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(18, 4),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "boolean": T.BooleanType(),
}


def fill_nulls(df: DataFrame, text_fill: str = "N/A", numeric_fill: float = 0) -> DataFrame:
    """A7 — ref fills string nulls with user text, numeric nulls with 0
    (``simple_etl.py:192-199``). ``na.fill`` type-dispatches exactly as the
    ref's two-call sequence did."""
    return df.na.fill(text_fill).na.fill(numeric_fill)


def deduplicate(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """A8 — drop duplicate rows (``simple_etl.py:203-210``).

    At scale this is one hash-shuffle on the dedup key; prefer ``subset``
    (key columns) over whole-row dedup so the shuffle key stays narrow.
    """
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def dedup_count(df: DataFrame, subset: list[str] | None = None) -> tuple[DataFrame, int]:
    """A8+A9 — ref reports rows removed via two full counts
    (``simple_etl.py:204-206``). Kept for parity; at scale call it on a
    cached frame or skip the delta."""
    before = df.count()
    out = deduplicate(df, subset)
    return out, before - out.count()


def replace_value(df: DataFrame, column: str, old, new) -> DataFrame:
    """A10 — exact-value replace in one column (``simple_etl.py:223-228``).

    Unlike the ref (string-compares against possibly-numeric columns), the
    literal is cast to the column's type so comparison stays typed and
    codegen-friendly.
    """
    dtype = dict(df.dtypes)[column]
    old_lit = F.lit(old).cast(dtype)
    new_lit = F.lit(new).cast(dtype)
    return df.withColumn(
        column, F.when(F.col(column).eqNullSafe(old_lit), new_lit).otherwise(F.col(column))
    )


def filter_contains(df: DataFrame, column: str, needle: str, case_sensitive: bool = True) -> DataFrame:
    """A11 — substring filter (``simple_etl.py:236-241``). The checkpoint
    version was case-insensitive (``simple_etl-checkpoint.py:226-229``);
    exposed as a flag, default matches the main file (sensitive)."""
    col = F.col(column)
    if not case_sensitive:
        return df.filter(F.lower(col).contains(needle.lower()))
    return df.filter(col.contains(needle))


def split_column(df: DataFrame, column: str, delimiter: str, n_parts: int = 2) -> DataFrame:
    """A13 — split a string column, appending ``{col}_1..{col}_n``
    (``simple_etl.py:262-273``). Delimiter is regex, matching Spark/ref
    ``split`` semantics — escape it upstream for literal use."""
    parts = F.split(F.col(column), delimiter)
    out = df
    for i in range(n_parts):
        # F.get (not getItem): null on missing index — ANSI mode would
        # otherwise raise INVALID_ARRAY_INDEX for rows with fewer parts
        out = out.withColumn(f"{column}_{i + 1}", F.get(parts, i))
    return out


def merge_columns(df: DataFrame, columns: list[str], separator: str, new_name: str) -> DataFrame:
    """A14 — concat ≥2 columns with a separator (``simple_etl.py:281-288``);
    ``concat_ws`` null-skipping semantics preserved."""
    return df.withColumn(new_name, F.concat_ws(separator, *[F.col(c) for c in columns]))


def cast_column(df: DataFrame, column: str, type_name: str, date_format: str | None = None) -> DataFrame:
    """A15 — change one column's type (``simple_etl.py:296-311``).

    Plain cast is null-on-error, matching both the ref's Spark cast and the
    checkpoint's ``pd.to_datetime(errors='coerce')``. ``date_format``
    extends the ref for non-ISO date strings via ``to_date(fmt)``.
    """
    t = type_name.lower()
    if t not in _CAST_TYPES:
        raise ValueError(f"unsupported cast type {type_name!r}; one of {sorted(_CAST_TYPES)}")
    if t == "date" and date_format:
        return df.withColumn(column, F.to_date(F.col(column), date_format))
    # try_cast, not cast: null-on-error is the documented semantics (the
    # ref's Spark 3 cast and the checkpoint's to_datetime(errors='coerce')
    # both coerce); Spark 4's ANSI-mode cast would raise instead
    return df.withColumn(column, F.col(column).try_cast(_CAST_TYPES[t]))


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """B2 — bulk rename."""
    return df.withColumnsRenamed(mapping)


def transpose(df: DataFrame, max_rows: int = 10_000) -> DataFrame:
    """A12 — whole-table rows↔columns flip (``simple_etl.py:246-251``).

    Inherently driver-bound (the output schema depends on the row count),
    so this is a guarded faithful port of the ref's pandas ``.T``. For the
    scalable long↔wide reshape use :func:`etlbigdata_spark.operators.pivot.pivot`
    / ``unpivot`` instead.
    """
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"transpose materializes the table on the driver ({n} rows > {max_rows}); "
            "use pivot/unpivot for the scalable reshape"
        )
    pdf = df.toPandas().T.reset_index()
    pdf.columns = ["column"] + [f"row_{i}" for i in range(n)]
    pdf = pdf.astype(str)
    spark = df.sparkSession
    return spark.createDataFrame(pdf)


def with_column(df: DataFrame, name: str, expr: Column | str) -> DataFrame:
    """B2 helper — computed column from a Column or SQL expression string."""
    return df.withColumn(name, F.expr(expr) if isinstance(expr, str) else expr)


def keep_latest(df: DataFrame, keys: list[str], order_cols: list) -> DataFrame:
    """A8/B10 — CDC-style compaction: keep ONE row per key, the one
    ranking first under ``order_cols`` (pass columns/expressions,
    typically ``[F.col("updated_at").desc(), F.col("id").desc()]`` —
    include a unique tiebreaker so the survivor is deterministic).

    One hash shuffle on ``keys`` (window row_number), no join — the
    standard "latest version wins" reducer over a change stream before
    a merge/publish step. At scale prefer this over
    ``dropDuplicates(keys)``, which keeps an ARBITRARY row.
    """
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_history(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    attrs: list[str],
    order_tiebreak: list | None = None,
    collapse_unchanged: bool = True,
) -> DataFrame:
    """CDC change stream → slowly-changing-dimension (SCD type 2)
    history: one row per (key, version) with ``valid_from`` /
    ``valid_to`` / ``is_current``, the companion to :func:`keep_latest`
    (which keeps only the final version) and ``merge_upsert`` (which
    applies it).

    ``attrs`` are the tracked attribute columns; with
    ``collapse_unchanged`` (default) consecutive rows whose attrs are
    unchanged merge into one validity interval — a heartbeat feed
    collapses to true change points (null-safe comparison, so
    null→null is "unchanged" and null→value is a change).

    Plan: ONE hash shuffle on ``keys``; both windows (the change-point
    lag and the interval lead) share its partitioning, so collapsing
    costs no extra exchange. Include ``order_tiebreak`` (e.g. an event
    id) when ``ts_col`` can tie, or version order is nondeterministic.
    Open intervals carry ``valid_to = NULL`` + ``is_current = true``.
    """
    order = [F.col(ts_col).asc()] + list(order_tiebreak or [])
    w = Window.partitionBy(*keys).orderBy(*order)
    if collapse_unchanged:
        changed = F.row_number().over(w) == 1  # first version always starts an interval
        for a in attrs:
            changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
        df = df.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    valid_to = F.lead(ts_col).over(w)
    return df.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
