"""MERGE / upsert (SQL:2003 MERGE semantics as a DataFrame composition).

The reference loads tables into MySQL with overwrite/append only
(``simple_etl.py:345`` mode="overwrite"); real ETL pipelines need the
third mode — upsert a delta into an existing table. Spark has no MERGE
on plain parquet (that is a table-format feature), but the semantics are
a single full-outer join:

* matched (key in both)      → source values win (last-write-wins update)
* unmatched source (new key) → inserted
* unmatched target           → kept
* matched + delete condition → dropped

At scale this is one shuffle on the merge keys (or none, if both sides
are bucketed on them — compose with ``operators.scale``'s bucketed
layout); broadcast a small delta by passing ``F.broadcast(source)``.
The result is a DataFrame — pair with ``sources.writers.write_parquet``
for read-merge-write, the standard pattern before table formats.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    delete_condition: Column | None = None,
    evolve_schema: bool = False,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys``.

    ``update_cols`` limits which non-key columns a MATCHED row takes
    from the source (default: all shared non-key columns; non-updated
    columns keep the target value, and inserted rows take the source
    value where one exists). ``delete_condition`` is evaluated over the
    joined row for MATCHED rows only ("when matched and <cond> then
    delete") — reference source columns as ``F.col("s.<name>")`` and
    target columns as ``F.col("t.<name>")``. Output columns and order
    follow the target schema.

    Duplicate source keys produce one output row per duplicate, as a
    join must — MERGE would reject them; deduplicate upstream. Keys are
    matched null-safely (``eqNullSafe``, = DuckDB's IS NOT DISTINCT
    FROM), so both engines agree on null-key rows.

    ``evolve_schema=True`` is the table-format "automatic schema
    evolution" mode: SOURCE-ONLY columns are appended to the output
    (after the target schema, in source order) — matched and inserted
    rows take the source value, target-only rows get NULL.  Off by
    default because widening the table is a contract change the caller
    should opt into; without it, source-only columns are silently
    ignored (the plain-MERGE contract: output follows the target
    schema).
    """
    cols = target.columns
    new_cols = (
        [c for c in source.columns if c not in cols] if evolve_schema else []
    )
    missing = sorted({k for k in keys if k not in cols} | {k for k in keys if k not in source.columns})
    if missing:
        raise ValueError(f"merge keys {missing} absent from one side")
    upd = set(update_cols) if update_cols is not None else (
        {c for c in cols if c not in keys} & set(source.columns)
    )
    bad = sorted(upd - set(source.columns))
    if bad:
        raise ValueError(f"update_cols {bad} absent from source")

    s = source.withColumn("__s", F.lit(1)).alias("s")
    t = target.withColumn("__t", F.lit(1)).alias("t")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    )
    j = t.join(s, cond, "full_outer")
    src_present = F.col("s.__s").isNotNull()
    tgt_present = F.col("t.__t").isNotNull()
    if delete_condition is not None:
        # SQL MERGE "when matched and <cond> then delete" only deletes when
        # the condition is TRUE; a NULL condition (e.g. it references a null
        # column) must KEEP the row. Without the coalesce, ~(... & NULL) is
        # NULL and filter() would silently drop it.
        j = j.filter(
            ~(src_present & tgt_present & F.coalesce(delete_condition, F.lit(False)))
        )

    out = []
    for c in cols:
        if c in keys or c in upd:
            out.append(F.when(src_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c))
        else:
            fallback = F.col(f"s.{c}") if c in source.columns else F.lit(None)
            out.append(F.when(tgt_present, F.col(f"t.{c}")).otherwise(fallback).alias(c))
    for c in new_cols:
        # evolved column: source value where a source row exists
        # (matched or inserted), NULL for kept target-only rows
        out.append(F.when(src_present, F.col(f"s.{c}")).alias(c))
    return j.select(*out)


def diff_tables(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Read-side twin of :func:`merge_upsert`: classify every key across
    two snapshots — the validation step after a migration, backfill, or
    CDC sync ("did the copy actually converge?").

    Returns one row per key with ``change_type`` ∈
    ``only_left | only_right | changed | same`` plus the key columns.
    ONE full-outer shuffle join on the keys (bucket both sides on them
    to make it exchange-free, same note as merge); non-key values
    compare as a single null-safe struct equality, so NULL == NULL is
    ``same``, not ``changed``.

    Keys must be unique per side (the snapshot contract; pre-compact
    with ``cleaning.keep_latest`` otherwise) — duplicate keys would
    fan out the join and double-count classifications.
    """
    if not keys:
        raise ValueError("need at least one key column")
    cols = compare_cols or [c for c in left.columns if c not in keys]
    missing = [c for c in cols + keys if c not in right.columns]
    if missing:
        raise ValueError(f"right side lacks columns {missing}")
    lv = F.struct(*[F.col(f"l.{c}").alias(c) for c in cols])
    rv = F.struct(*[F.col(f"r.{c}").alias(c) for c in cols])
    # presence markers, NOT key-nullness: the null-safe join matches
    # null keys across sides, where a key column would read as "absent"
    left = left.withColumn("__in_l", F.lit(1))
    right = right.withColumn("__in_r", F.lit(1))
    joined = left.alias("l").join(
        right.alias("r"),
        on=[F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}")) for k in keys],
        how="full_outer",
    )
    in_l, in_r = F.col("l.__in_l").isNotNull(), F.col("r.__in_r").isNotNull()
    change = (
        F.when(in_l & ~in_r, F.lit("only_left"))
        .when(in_r & ~in_l, F.lit("only_right"))
        .when(lv.eqNullSafe(rv), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    key_out = [
        F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys
    ]
    return joined.select(*key_out, change.alias("change_type"))


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(change_type, n) rollup of :func:`diff_tables` — the one-screen
    convergence report (all-``same`` = the sync is clean)."""
    return (
        diff_tables(left, right, keys, compare_cols)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
