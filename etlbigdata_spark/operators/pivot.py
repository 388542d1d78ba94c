"""Pivot / unpivot (SURVEY §2 B16) — the scalable generalization of the
reference's whole-table transpose (A12, ``simple_etl.py:246-251``, which
the ref itself flags as "not supported natively in Spark" and does in
pandas on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {"sum": F.sum, "count": F.count, "avg": F.avg, "min": F.min, "max": F.max, "first": F.first}


def pivot(
    df: DataFrame,
    group_by: list[str],
    pivot_col: str,
    value_col: str,
    agg: str = "sum",
    values: list | None = None,
) -> DataFrame:
    """Long→wide. Pass ``values`` explicitly when known — it skips the
    extra distinct-values job Spark otherwise runs before planning."""
    g = df.groupBy(*group_by).pivot(pivot_col, values) if values else df.groupBy(*group_by).pivot(pivot_col)
    return g.agg(_AGGS[agg](value_col))


def unpivot(
    df: DataFrame,
    ids: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long via native ``unpivot`` (melt) — no driver round-trip."""
    return df.unpivot(ids, value_cols, var_name, value_name)
