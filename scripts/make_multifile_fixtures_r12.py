#!/usr/bin/env python
"""Apply the adopted multi-file fact layout rule to the scale fixtures
(round-12 brief item 3; MULTIFILE_SF10_r11.json's ship decision).

Round 11 proved q01's entire single-file sf10 gap was file-split
parallelism (3.46 s -> 1.38 s on an ORDER-PRESERVING split at default
``maxPartitionBytes``), that a random-order ``repartition`` layout is
strictly WORSE (row-order destruction costs more than splits buy), and
that the 32m split knob has no effect on the real layout — so the ship
decision was a LAYOUT rule, not a conf change: facts land as many
order-preserving files, which ``sources/writers.write_parquet`` already
produces.  The bench fixtures at /tmp/scaled/sf{1,1z,10}, however, are
still the single-file straw man, so the shipped headline pairs still
pay the gap (VERDICT r11 "What's wrong" item 3).

This script builds ``<sf_dir>o`` siblings (e.g. /tmp/scaled/sf10 ->
/tmp/scaled/sf10o): every table above SPLIT_BYTES is rewritten as an
order-preserving multi-file directory (read at 48m splits, one part
file per split — exactly how the library's writer lands a big table);
small tables are symlinked.  Row-for-row identity is then verified
per table (count + a column-insensitive int64 content checksum over a
cheap deterministic projection), so the re-paired suites provably read
the SAME rows — only the file layout differs.  The DuckDB side of a
pair reads the identical multi-file layout via benchutil's
directory-glob view registration (both engines see the same bytes).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etlbigdata_spark.benchutil import ORACLE_TABLES as TABLES  # noqa: E402
from etlbigdata_spark.session import build_session  # noqa: E402

SPLIT_BYTES = 48 << 20
SRC_DIRS = sys.argv[1:] or ["/tmp/scaled/sf1", "/tmp/scaled/sf1z", "/tmp/scaled/sf10"]


def content_checksum(spark, path: str) -> tuple[int, int]:
    """(row count, order-insensitive content checksum): xxhash64 of the
    row's JSON rendering, summed — layout- and order-independent."""
    df = spark.read.parquet(path)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: a long sum of 10^7 xxhash64 values
        # overflows under ANSI mode
        F.sum(F.xxhash64(F.to_json(F.struct(*sorted(df.columns)))).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def main() -> None:
    spark = build_session(
        app_name="make_multifile_fixtures_r12",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    for src in SRC_DIRS:
        dest = src.rstrip("/") + "o"
        os.makedirs(dest, exist_ok=True)
        for t in TABLES:
            s, d = f"{src}/{t}.parquet", f"{dest}/{t}.parquet"
            if os.path.islink(d):
                continue
            if not os.path.exists(d):
                if os.path.getsize(s) < SPLIT_BYTES:
                    os.symlink(s, d)
                    continue
                # order-preserving split: read at 48m splits, write one
                # part per split — NO repartition (the rejected straw man)
                spark.conf.set("spark.sql.files.maxPartitionBytes", str(SPLIT_BYTES))
                spark.read.parquet(s).write.mode("overwrite").parquet(d)
                spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
            # verify row-for-row identity even on rerun (a prior run may
            # have written but crashed before verifying)
            n_src, h_src = content_checksum(spark, s)
            n_dst, h_dst = content_checksum(spark, d)
            n_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
            assert (n_src, h_src) == (n_dst, h_dst), (
                f"{d}: content drift! src ({n_src}, {h_src}) vs dst ({n_dst}, {h_dst})"
            )
            print(f"{d}: {n_files} files, {n_src} rows, checksum OK")
    print("done")


if __name__ == "__main__":
    main()
