"""etlbigdata_spark — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
MasterJonathan/etlbigdata (see SURVEY.md), extended with the relational,
streaming and LLM-data-pipeline operators of SURVEY.md §2 Part B.
"""

from .engine import Engine
from .session import build_session

__all__ = ["Engine", "build_session"]
__version__ = "0.1.0"
