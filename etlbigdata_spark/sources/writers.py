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
    bloom_filter_cols: list[str] | None = None,
    bloom_filter_ndv: int | dict[str, int] | None = None,
    **opts,
) -> None:
    """Parquet sink (A18). ``partition_by`` enables partition pruning for
    readers.  ``cluster_by`` range-partitions and sorts the data on the
    given keys before writing, so each output file covers a narrow,
    disjoint key range — parquet min/max row-group stats then prune
    whole files for selective predicates on those keys (the data-layout
    lever for 100 TB scans; orthogonal to ``partition_by``, which prunes
    by directory).

    ``bloom_filter_cols`` writes a parquet BLOOM FILTER per listed
    column (parquet-mr ``parquet.bloom.filter.enabled#<col>``) — the
    point-lookup complement to the two range levers above: min/max
    stats and z-order only skip when the file/row-group key RANGE
    excludes the predicate, which high-cardinality unsorted keys
    (ids, hashes, UUIDs) never satisfy; a bloom filter answers
    "definitely not in this row group" probabilistically regardless of
    ordering, so Spark's reader (parquet-mr row-group filtering, on by
    default with ``spark.sql.parquet.filterPushdown``) drops whole row
    groups on ``key = literal`` lookups.  Size the filter with
    ``bloom_filter_ndv`` (int for all columns or ``{col: ndv}``) —
    expected distinct values per ROW GROUP; unset, parquet-mr defaults
    to 1M NDV ≈ 1.2 MB per column per row group, usually oversized.
    Dictionary-encoded columns already skip via dictionary pages;
    blooms pay off exactly when cardinality forces plain encoding."""
    if bloom_filter_cols:
        for c in bloom_filter_cols:
            opts[f"parquet.bloom.filter.enabled#{c}"] = "true"
            ndv = (
                bloom_filter_ndv.get(c)
                if isinstance(bloom_filter_ndv, dict)
                else bloom_filter_ndv
            )
            if ndv:
                opts[f"parquet.bloom.filter.expected.ndv#{c}"] = str(int(ndv))
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


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite", **opts
) -> None:
    """XML sink (Spark 4 native datasource; one ``row_tag`` element per
    row, partition-parallel like every file sink)."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).options(**opts).save(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite", **opts) -> None:
    """Avro sink — needs the ``spark-avro`` datasource module on the
    classpath (see ``readers.read_avro``'s documented gate)."""
    df.write.mode(mode).format("avro").options(**opts).save(path)


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


def zorder_column(cols: list[str], mins: list, maxs: list, bits: int = 16):
    """Z-value (Morton code) expression over numeric columns: each value
    is min/max-scaled to ``bits`` bits, then the bits are interleaved —
    all in codegen bitwise expressions (no UDF). Min/max scaling keeps
    the build one cheap 1-row agg; for heavily skewed columns
    pre-transform (log, rank) before calling, as linear scaling
    concentrates z-values where the data does.

    ``len(cols) * bits`` must fit in the 64-bit z-value: the JVM's
    shiftleft wraps the shift amount mod 64, so an overflowing interleave
    would silently corrupt the Morton code (degraded clustering, no
    error). Raises instead — callers with many columns should pass
    ``bits=64 // len(cols)`` (``write_zordered`` does this automatically).
    """
    from pyspark.sql import functions as F

    if len(cols) * bits > 64:
        raise ValueError(
            f"z-order interleave needs len(cols)*bits <= 64, got "
            f"{len(cols)}*{bits}={len(cols) * bits}; use bits<={64 // len(cols)}"
        )
    top = (1 << bits) - 1
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.greatest(
                    F.lit(0),
                    ((F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span) * top).cast("long"),
                ),
            )
        )
    z = F.lit(0).cast("long")
    n = len(scaled)
    for b in range(bits):
        for i, p in enumerate(scaled):
            bit = F.shiftright(p, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
    **opts,
) -> None:
    """A18 sibling — MULTI-dimensional clustered parquet layout: range-
    partition + sort on a Morton z-value so every output file covers a
    narrow region of the combined key space. Where ``cluster_by`` prunes
    on ONE key's min/max stats, z-order keeps per-file ranges narrow on
    ALL ``cols`` simultaneously — selective predicates on any clustered
    dimension skip most files (the multi-column file-skipping lever used
    by lakehouse OPTIMIZE ZORDER, here as a plain parquet write).

    The min/max bounds come from one 1-row aggregate over the input
    (scanned once more at write time — the write is the expensive step
    anyway); the z-value is a pure codegen bitwise expression.
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    mins = [bounds[f"lo_{c}"] for c in cols]
    maxs = [bounds[f"hi_{c}"] for c in cols]
    # auto-fit the per-column resolution to the 64-bit z-value (5 cols at
    # the default 16 bits would otherwise overflow the interleave)
    if len(cols) > 64:
        raise ValueError(f"z-order supports at most 64 columns, got {len(cols)}")
    bits = min(bits, 64 // len(cols))
    z = zorder_column(cols, mins, maxs, bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode(mode).options(**opts).parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    sort_within: list[str] | None = None,
) -> dict:
    """Small-files compaction (the lifecycle op every streaming parquet
    sink eventually needs): rewrite a directory of many small parquet
    files into ``ceil(bytes / target_file_bytes)`` right-sized ones.
    LOCAL-FILESYSTEM ONLY: the staging/swap protocol below needs
    POSIX-atomic directory rename, which object stores don't have —
    paths with a URI scheme (s3://, hdfs://, ...) raise
    NotImplementedError rather than silently no-op (on those stores use
    a table format's OPTIMIZE/rewrite, which is the same operation under
    a real transaction log); a missing directory raises FileNotFoundError.

    Micro-batch sinks shed one file per partition per trigger; at
    100 TB that is millions of KB-sized files whose open/footer cost
    dominates scans and whose row groups are too small for effective
    min/max pruning. Compaction is one job: coalesce to the target
    count when shrinking (no shuffle — partitions concatenate) or
    repartition when growing; optional ``sort_within`` restores a
    clustering order destroyed by interleaved micro-batches.

    Rewrite is staged through ``<path>.__compacting`` then swapped in by
    directory rename, so a reader sees the old files, the new files, or
    (for the instant between the two renames) a transient not-found it
    can retry — never a half-written mix. True atomicity needs a table
    format / metastore — documented boundary; a crash between renames
    leaves the data intact under ``<path>.__precompact``, and the next
    call refuses to run until that leftover is restored or removed.

    Guarded boundaries: Hive-partitioned layouts (nested key=value
    dirs) and streaming-sink logs (``_spark_metadata``) are refused —
    compact each partition directory individually, and never compact
    under a running streaming sink whose log records the old files.
    Returns ``{files_before, files_after, bytes}``. No-op below
    ``min_files``.
    """
    import glob as _glob
    import math
    import os
    import shutil

    if "://" in path:
        raise NotImplementedError(
            f"compact_parquet is local-filesystem only (needs atomic directory "
            f"rename); got a URI-scheme path {path!r} — use a table format's "
            "rewrite/OPTIMIZE on object stores"
        )
    root = path.rstrip("/")
    if not os.path.isdir(root):
        raise FileNotFoundError(f"compact_parquet: {path!r} is not a directory")
    backup = root + ".__precompact"
    if os.path.exists(backup):
        raise RuntimeError(
            f"leftover {backup} from an interrupted compaction — restore or "
            "remove it before compacting again (the data may live only there)"
        )
    if os.path.isdir(os.path.join(root, "_spark_metadata")):
        raise ValueError(
            f"{path} carries a streaming-sink transaction log (_spark_metadata); "
            "compacting would break the sink's file manifest — stop the query "
            "and migrate off the metadata log first"
        )
    files = [f for f in _glob.glob(os.path.join(path, "*.parquet")) if os.path.isfile(f)]
    nested = [
        d for d in _glob.glob(os.path.join(root, "*"))
        if os.path.isdir(d) and "=" in os.path.basename(d)
    ]
    if nested:
        raise ValueError(
            f"{path} is Hive-partitioned ({os.path.basename(nested[0])}, ...); "
            "compact each partition directory individually so partition "
            "pruning metadata survives"
        )
    if len(files) < min_files:
        return {"files_before": len(files), "files_after": len(files), "bytes": sum(map(os.path.getsize, files))}
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    out = df.coalesce(n_out) if n_out < len(files) else df.repartition(n_out)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    staging = root + ".__compacting"
    out.write.mode("overwrite").parquet(staging)
    os.rename(root, backup)
    try:
        os.rename(staging, root)
    except OSError:
        os.rename(backup, root)  # restore — old data wins over no data
        raise
    shutil.rmtree(backup)
    after = [f for f in _glob.glob(os.path.join(path, "*.parquet")) if os.path.isfile(f)]
    return {"files_before": len(files), "files_after": len(after), "bytes": total}
