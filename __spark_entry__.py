"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship M0 proof query (SURVEY.md §7) at sf0.001;
``queries`` / ``oracle_sql`` expose the full declared workload from
``etlbigdata_spark.workload`` (one entry per implemented operator of
SURVEY.md §2, DuckDB oracle twins where SQL can express the semantics).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etlbigdata_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.q05_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(workload.ORACLE_SQL)
