"""Engine facade: session + catalog + SQL entry point.

Replaces the reference's Streamlit wizard (Extract → Transform → Load,
``/root/reference/simple_etl.py:49``) with a library API.  All three
stages are method groups here; data never leaves the JVM between ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog
from .session import build_session
from .sources import readers, writers


class Engine:
    def __init__(self, spark: SparkSession | None = None, **session_kwargs) -> None:
        self.spark = spark or build_session(**session_kwargs)
        self.catalog = Catalog(self.spark)

    # -- Extract (SURVEY §2 A1-A5) ------------------------------------
    def load_parquet(self, path: str, name: str | None = None) -> DataFrame:
        df = readers.read_parquet(self.spark, path)
        return self._maybe_register(name, df)

    def load_csv(self, path: str, name: str | None = None, **opts) -> DataFrame:
        df = readers.read_csv(self.spark, path, **opts)
        return self._maybe_register(name, df)

    def load_json(self, path: str, name: str | None = None, **opts) -> DataFrame:
        df = readers.read_json(self.spark, path, **opts)
        return self._maybe_register(name, df)

    def load_excel(self, path: str, name: str | None = None, **opts) -> DataFrame:
        df = readers.read_excel(self.spark, path, **opts)
        return self._maybe_register(name, df)

    def load_jdbc(self, url: str, table: str, name: str | None = None, **opts) -> DataFrame:
        df = readers.read_jdbc(self.spark, url, table, **opts)
        return self._maybe_register(name, df)

    def load_testdata(self, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
        """Register the driver star schema from a ``/root/testdata/sf*`` dir."""
        tables = tables or [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
        return {t: self.load_parquet(f"{sf_dir}/{t}.parquet", name=t) for t in tables}

    # -- Query --------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """SQL entry point (B1): Catalyst is the parser/optimizer/planner."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.catalog.get(name)

    # -- Load (A18-A20) -----------------------------------------------
    def save_parquet(self, df: DataFrame, path: str, mode: str = "overwrite", **opts) -> None:
        writers.write_parquet(df, path, mode=mode, **opts)

    def save_csv(self, df: DataFrame, path: str, mode: str = "overwrite", **opts) -> None:
        writers.write_csv(df, path, mode=mode, **opts)

    def save_jdbc(self, df: DataFrame, url: str, table: str, mode: str = "overwrite", **opts) -> None:
        writers.write_jdbc(df, url, table, mode=mode, **opts)

    def _maybe_register(self, name: str | None, df: DataFrame) -> DataFrame:
        if name:
            self.catalog.register(name, df)
        return df
