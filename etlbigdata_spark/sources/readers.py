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


def read_orc(spark: SparkSession, path: str, **opts) -> DataFrame:
    """ORC scan (A3 sibling — the other columnar lake format Spark reads
    natively; same pushdown/pruning machinery as parquet)."""
    return spark.read.options(**opts).orc(path)


def read_text(spark: SparkSession, path: str, whole_text: bool = False, **opts) -> DataFrame:
    """Line-text source: one row per line (``value`` string), or one row
    per FILE with ``whole_text`` — the raw-corpus ingestion shape for
    document pipelines."""
    return spark.read.options(**opts).text(path, wholetext=whole_text)


def _is_buffer(src) -> bool:
    """True for in-memory sources: bytes or file-like objects."""
    return isinstance(src, (bytes, bytearray)) or hasattr(src, "read")


def read_csv(
    spark: SparkSession,
    path,
    header: bool = True,
    infer_schema: bool = True,
    schema: T.StructType | None = None,
    all_strings: bool = False,
    **opts,
) -> DataFrame:
    """CSV scan (A1).

    ``path`` may be a filesystem path/glob (distributed Spark scan — the
    scale path) or an in-memory buffer (``bytes`` / file-like, the
    reference's upload path ``simple_etl.py:62-70``). A buffer is by
    definition driver-resident and upload-sized, so it parses driver-side
    with pandas and enters Spark via ``createDataFrame`` — same semantics,
    documented small-data-only.

    ``all_strings=True`` reproduces the reference's dirty-data fallback
    (``simple_etl.py:168-169``: coerce whole table to str) as an explicit
    opt-in instead of a silent rescue.

    Buffer mode honors the common Spark CSV options (``sep``/``delimiter``,
    ``nullValue``, ``quote``, ``escape``, ``comment``, ``encoding``) by
    mapping them onto ``pd.read_csv``, and raises on any other option —
    the two modes must never parse the same bytes differently.
    """
    if _is_buffer(path):
        import io

        import pandas as pd

        # map the Spark-reader option names onto their pandas equivalents
        # so a buffer parses the SAME way as a path; anything we can't
        # translate raises instead of silently changing the parse
        _BUF_OPT_MAP = {"sep": "sep", "delimiter": "sep", "nullValue": "na_values",
                        "quote": "quotechar", "escape": "escapechar", "comment": "comment",
                        "encoding": "encoding"}
        unsupported = sorted(set(opts) - set(_BUF_OPT_MAP))
        if unsupported:
            raise ValueError(
                f"read_csv buffer mode cannot honor option(s) {unsupported}; "
                "write the buffer to a file and pass the path for the full "
                "Spark CSV option surface"
            )
        pd_opts = {_BUF_OPT_MAP[k]: v for k, v in opts.items()}
        buf = io.BytesIO(path) if isinstance(path, (bytes, bytearray)) else path
        pdf = pd.read_csv(
            buf,
            header=0 if header else None,
            dtype=str if (all_strings or not infer_schema) else None,
            **pd_opts,
        )
        if not header:
            pdf.columns = [f"_c{i}" for i in range(len(pdf.columns))]
        return spark.createDataFrame(pdf, schema=schema)
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


def read_excel(spark: SparkSession, path, sheet_name=0, **opts) -> DataFrame:
    """Excel (A2, ref ``simple_etl.py:71-72``): driver-side pandas by design.

    ``path`` may be a filesystem path or an in-memory buffer (``bytes`` /
    file-like — the reference's ``st.file_uploader`` hands exactly that);
    ``pd.read_excel`` accepts both natively. Documented small-file-only
    path (SURVEY §7 hard-parts); a .xlsx that matters at scale should be
    converted to parquet upstream.
    """
    import io

    import pandas as pd

    if isinstance(path, (bytes, bytearray)):
        path = io.BytesIO(path)
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


# Per-dialect table-discovery queries: information_schema for the
# MySQL/Postgres family (what the reference targeted), system catalogs
# for embedded engines. {database} is substituted where the dialect
# scopes by schema.
_DISCOVERY_SQL = {
    "mysql": "SELECT table_name FROM information_schema.tables WHERE table_schema = '{database}'",
    "postgresql": "SELECT table_name FROM information_schema.tables WHERE table_schema = '{database}'",
    "derby": "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'",
}


def list_jdbc_tables(
    spark: SparkSession, url: str, database: str = "", dialect: str | None = None, **opts
) -> list[str]:
    """DB discovery (A4, ref ``simple_etl.py:99-108``).

    Dialect is inferred from the JDBC URL (``jdbc:<dialect>:...``) unless
    given; the discovery query runs as a JDBC subquery scan, so it
    exercises the same partitionable read path as any table scan.
    Tested for real against embedded Derby (tests/test_io.py) — the
    MySQL form is identical modulo the catalog query.
    """
    dialect = dialect or url.split(":")[1].lower()
    template = _DISCOVERY_SQL.get(dialect, _DISCOVERY_SQL["mysql"])
    df = read_jdbc(spark, url, f"({template.format(database=database)}) t", **opts)
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
