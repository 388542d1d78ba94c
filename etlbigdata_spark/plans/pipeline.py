"""Declarative op-list pipeline (SURVEY §3.2 entry point 2).

Parity with the reference's click pipeline: an ordered list of op
descriptors, each mirroring a §2 Part-A signature, folded over a lazy
DataFrame.  Where the reference materialized after every click
(``simple_etl.py:197`` et al.), this folds the whole list into ONE
Catalyst plan — predicate pushdown / column pruning / fusion see the
entire pipeline, and exactly one job runs at the terminal action.

    Pipeline([
        {"op": "fill_nulls", "text_fill": "N/A"},
        {"op": "dedup"},
        {"op": "filter_contains", "column": "Status", "needle": "Paid"},
    ]).apply(df)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import cleaning, joins, setops


def _op_select(df: DataFrame, columns: list[str]) -> DataFrame:
    return df.select(*columns)


def _op_drop(df: DataFrame, columns: list[str]) -> DataFrame:
    return df.drop(*columns)


def _op_filter_expr(df: DataFrame, expr: str) -> DataFrame:
    return df.filter(expr)


def _op_sort(df: DataFrame, by: list[str], ascending: bool = True) -> DataFrame:
    cols = [F.col(c).asc() if ascending else F.col(c).desc() for c in by]
    return df.orderBy(*cols)


def _op_limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


_OPS = {
    # Part A parity
    "fill_nulls": cleaning.fill_nulls,
    "dedup": cleaning.deduplicate,
    "replace_value": cleaning.replace_value,
    "filter_contains": cleaning.filter_contains,
    "split_column": cleaning.split_column,
    "merge_columns": cleaning.merge_columns,
    "cast_column": cleaning.cast_column,
    "rename_columns": cleaning.rename_columns,
    "with_column": cleaning.with_column,
    # general relational
    "select": _op_select,
    "drop": _op_drop,
    "filter": _op_filter_expr,
    "sort": _op_sort,
    "limit": _op_limit,
}


class Pipeline:
    def __init__(self, steps: list[dict]) -> None:
        for s in steps:
            if s.get("op") not in _OPS and s.get("op") not in ("join", "union"):
                raise ValueError(f"unknown op {s.get('op')!r}")
        self.steps = steps

    def apply(self, df: DataFrame, catalog=None) -> DataFrame:
        """Fold the op list over ``df``. ``join``/``union`` steps resolve
        their other side from ``catalog`` (a Catalog or {name: DataFrame})."""
        out = df
        for step in self.steps:
            kwargs = {k: v for k, v in step.items() if k != "op"}
            op = step["op"]
            if op == "join":
                other = _resolve(catalog, kwargs.pop("right"))
                out = joins.join(out, other, **kwargs)
            elif op == "union":
                others = [_resolve(catalog, n) for n in kwargs.pop("others")]
                out = setops.union_all([out, *others], **kwargs)
            else:
                out = _OPS[op](out, **kwargs)
        return out


def _resolve(catalog, name):
    if catalog is None:
        raise ValueError("join/union steps need a catalog")
    if hasattr(catalog, "get"):
        return catalog.get(name)
    return catalog[name]
