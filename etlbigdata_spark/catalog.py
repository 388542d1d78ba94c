"""Named-table catalog.

The reference's entire catalog is a dict of pandas frames in Streamlit
session state (``/root/reference/simple_etl.py:19-25``) with an
``active_key`` pointer, mutated per click.  Here the catalog keeps *lazy*
Spark DataFrames and mirrors each into a session temp view so the SQL
entry point (SURVEY §2 B1) resolves the same names.  Rebinding a name is
the immutable-lineage analogue of the reference's in-place overwrite
(``simple_etl.py:197`` et al.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    def register(self, name: str, df: DataFrame) -> DataFrame:
        """Bind ``name`` to a lazy frame + temp view (ref: data_store[name]=df)."""
        self._tables[name] = df
        df.createOrReplaceTempView(name)
        return df

    def get(self, name: str) -> DataFrame:
        return self._tables[name]

    def drop(self, name: str) -> None:
        """Remove a table (ref: sidebar delete, simple_etl.py:42-45)."""
        self._tables.pop(name, None)
        self.spark.catalog.dropTempView(name)

    def names(self) -> list[str]:
        return sorted(self._tables)

    def __contains__(self, name: str) -> bool:
        return name in self._tables
