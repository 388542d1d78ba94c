"""Distributed .xlsx source via Spark 4's Python DataSource API (A2's
scale path).

``readers.read_excel`` is driver-side by design (one upload-sized file,
matching the reference's ``st.file_uploader`` flow, ``simple_etl.py:71``).
This module covers the OTHER Excel shape — a directory of many .xlsx
drops (per-store exports, daily reports) — by registering a real Spark
data source: one input partition per file, parsed ON THE EXECUTORS with
the dependency-free stdlib parser (``readers._read_xlsx_stdlib``), so a
thousand workbooks read with a thousand-way parallel scan instead of a
driver loop. Spark 4's ``pyspark.sql.datasource`` API makes the source a
first-class ``spark.read.format("xlsx")`` citizen: schema inference,
explicit schemas, and the usual DataFrame pushdown machinery above it.

Per-file cost is driver-RAM-free but still whole-file (xlsx is a zip —
not splittable); files beyond a few hundred MB belong in parquet, same
guidance as the driver-side path.

DEPLOYMENT GATE (documented, not hidden): the reader partitions import
``etlbigdata_spark.sources.readers`` ON THE EXECUTORS, so on a real
cluster the package must be shipped to workers (``--py-files
etlbigdata_spark.zip`` / ``spark.submit.pyFiles`` / a cluster-wide pip
install) — local mode shares the driver's sys.path and hides this.
Same requirement as any Python data source or UDF that imports the
package; mirrors the read_avro-style documented gates elsewhere.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _expand(path: str) -> list[str]:
    """Path / directory / glob → sorted file list (deterministic
    partition order)."""
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.xlsx")))
    return sorted(_glob.glob(path)) or ([path] if os.path.exists(path) else [])


def _infer_field(values: list) -> T.DataType:
    """Narrowest Spark type covering the observed cell values."""
    kinds = {type(v) for v in values if v is not None}
    if not kinds:
        # all-null in the inference file: widest fallback — Boolean here
        # would coerce later files' strings to True/False silently
        return T.StringType()
    if kinds <= {bool}:
        return T.BooleanType()
    if kinds <= {int}:
        return T.LongType()
    if kinds <= {int, float}:
        return T.DoubleType()
    return T.StringType()


def _coerce(v, dtype: T.DataType):
    """Lenient per-cell cast so mixed-type files across a directory load
    instead of crashing mid-scan; unconvertible cells become null."""
    if v is None:
        return None
    try:
        if isinstance(dtype, T.BooleanType):
            return bool(v)
        if isinstance(dtype, T.LongType):
            return int(v)
        if isinstance(dtype, T.DoubleType):
            return float(v)
        return str(v)
    except (TypeError, ValueError):
        return None


class XlsxFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class XlsxReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType):
        self.paths = _expand(options.get("path", ""))
        if not self.paths:
            # with an explicit schema, DataSource.schema() never runs, so
            # this is the only place a typo'd path can fail loudly instead
            # of yielding a silent empty scan
            raise ValueError(f"no .xlsx files match {options.get('path')!r}")
        self.sheet = options.get("sheetName", 0)
        self.header = str(options.get("header", "true")).lower() != "false"
        self.schema = schema

    def partitions(self):
        return [XlsxFilePartition(p) for p in self.paths]

    def read(self, partition: XlsxFilePartition):
        # executor-side: stdlib parse of ONE workbook, coerced to the
        # shared schema
        from etlbigdata_spark.sources.readers import _read_xlsx_stdlib

        sheet = self.sheet
        if isinstance(sheet, str) and sheet.isdigit():
            sheet = int(sheet)
        rows = _read_xlsx_stdlib(partition.path, sheet_name=sheet)
        data = rows[1:] if (self.header and rows) else rows
        dtypes = [f.dataType for f in self.schema.fields]
        width = len(dtypes)
        for r in data:
            padded = (list(r) + [None] * width)[:width]
            yield tuple(_coerce(v, t) for v, t in zip(padded, dtypes))


class XlsxDataSource(DataSource):
    """``spark.read.format("xlsx").load(path_or_glob)``.

    Options: ``sheetName`` (index or name, default first sheet),
    ``header`` (default true). Schema: inferred from the FIRST file
    (names from its header row, types narrowed over its cells) unless
    an explicit ``.schema(...)`` is given — directories with drifting
    layouts should pass one.
    """

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self):
        from etlbigdata_spark.sources.readers import _read_xlsx_stdlib

        paths = _expand(self.options.get("path", ""))
        if not paths:
            raise ValueError(f"no .xlsx files match {self.options.get('path')!r}")
        sheet = self.options.get("sheetName", 0)
        if isinstance(sheet, str) and sheet.isdigit():
            sheet = int(sheet)
        rows = _read_xlsx_stdlib(paths[0], sheet_name=sheet)
        if not rows:
            raise ValueError(f"empty worksheet in {paths[0]}")
        header = str(self.options.get("header", "true")).lower() != "false"
        if header:
            names = [str(h) if h is not None else f"_c{i}" for i, h in enumerate(rows[0])]
            data = rows[1:]
        else:
            names = [f"_c{i}" for i in range(len(rows[0]))]
            data = rows
        cols = list(zip(*data)) if data else [[]] * len(names)
        return T.StructType(
            [T.StructField(n, _infer_field(list(c)), True) for n, c in zip(names, cols)]
        )

    def reader(self, schema: T.StructType) -> XlsxReader:
        return XlsxReader(self.options, schema)


def register(spark) -> None:
    """Make ``format("xlsx")`` available on this session (idempotent)."""
    spark.dataSource.register(XlsxDataSource)
