"""Source readers (SURVEY §2 A1-A5, B26).

The reference parses every upload driver-side with pandas
(``/root/reference/simple_etl.py:69-74``) and lists MySQL tables via
SQLAlchemy (``simple_etl.py:99-108``).  Here every scalable format goes
through the Spark reader (distributed scan, predicate pushdown, column
pruning); pandas remains only for Excel, which has no JVM-native reader
without third-party JARs and is small-file by nature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, **opts) -> DataFrame:
    """Columnar scan; filters/projection push into the parquet reader (A3)."""
    return spark.read.options(**opts).parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    schema: T.StructType | None = None,
    all_strings: bool = False,
    **opts,
) -> DataFrame:
    """CSV scan (A1).

    ``all_strings=True`` reproduces the reference's dirty-data fallback
    (``simple_etl.py:168-169``: coerce whole table to str) as an explicit
    opt-in instead of a silent rescue.
    """
    reader = spark.read.options(header=header, **opts)
    if schema is not None:
        reader = reader.schema(schema)
    elif not all_strings:
        reader = reader.option("inferSchema", infer_schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None, **opts) -> DataFrame:
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_excel(spark: SparkSession, path: str, sheet_name=0, **opts) -> DataFrame:
    """Excel (A2, ref ``simple_etl.py:71-72``): driver-side pandas by design.

    Documented small-file-only path (SURVEY §7 hard-parts); a .xlsx that
    matters at scale should be converted to parquet upstream.
    """
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet_name, **opts)
    return spark.createDataFrame(pdf)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    **opts,
) -> DataFrame:
    """JDBC scan (A5, ref ``simple_etl.py:114-123`` used driver-side pd.read_sql).

    With ``partition_column`` bounds the scan parallelizes across
    executors — the scale path the reference lacked.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def list_jdbc_tables(spark: SparkSession, url: str, database: str, **opts) -> list[str]:
    """DB discovery (A4, ref ``simple_etl.py:99-108``) via information_schema."""
    df = read_jdbc(
        spark,
        url,
        f"(SELECT table_name FROM information_schema.tables WHERE table_schema = '{database}') t",
        **opts,
    )
    return [r[0] for r in df.collect()]


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Multimodal ingestion (B26): opaque bytes + typed metadata columns.

    Yields ``path, modificationTime, length, content:binary`` — the raw
    substrate for the multimodal pipeline (functions/multimodal.py).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
