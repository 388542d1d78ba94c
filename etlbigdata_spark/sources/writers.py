"""Sinks (SURVEY §2 A18-A20).

The reference wrote parquet via pandas bytes (``simple_etl.py:369-372``)
and HDFS text via an RDD ``','.join`` with no quoting
(``simple_etl.py:374-388``).  All sinks here are DataFrame writers:
columnar parquet, RFC-4180 CSV, batched JDBC — each partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    cluster_partitions: int | None = None,
    **opts,
) -> None:
    """Parquet sink (A18). ``partition_by`` enables partition pruning for
    readers.  ``cluster_by`` range-partitions and sorts the data on the
    given keys before writing, so each output file covers a narrow,
    disjoint key range — parquet min/max row-group stats then prune
    whole files for selective predicates on those keys (the data-layout
    lever for 100 TB scans; orthogonal to ``partition_by``, which prunes
    by directory)."""
    if cluster_by:
        # explicit n pins the output file count (size files for the target
        # row-group budget); default lets AQE pick from data volume
        args = ([cluster_partitions] if cluster_partitions else []) + list(cluster_by)
        df = df.repartitionByRange(*args).sortWithinPartitions(*cluster_by)
    writer = df.write.mode(mode).options(**opts)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True, **opts) -> None:
    """CSV/text sink (A19) — replaces the ref's lossy RDD text writer with
    a proper quoted/escaped CSV writer (works against hdfs:// URLs too)."""
    df.write.mode(mode).options(header=header, **opts).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", **opts) -> None:
    """ORC sink (A18 sibling; columnar, partition-parallel)."""
    df.write.mode(mode).options(**opts).orc(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", **opts) -> None:
    df.write.mode(mode).options(**opts).json(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batchsize: int = 10000,
    **opts,
) -> None:
    """JDBC sink (A20, ref ``simple_etl.py:398-404`` row-looped to_sql)."""
    (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**opts)
        .save()
    )
