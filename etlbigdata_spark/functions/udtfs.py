"""Python UDTFs (SURVEY §2 B18 — the ``spark.udtf`` surface, Spark 4).

The capability (table-in/table-out Python) is already served at scale by
Arrow ``mapInPandas``; what this module adds is the *registration API*
the survey names: a class-based UDTF usable from SQL via ``LATERAL``.
Use the UDTF form for SQL-facing composability; keep ``mapInPandas`` for
the 100 TB hot path (UDTF ``eval`` is per-row Python unless Arrow
batching is enabled, which we do request).

Reference cite: none — the reference (simple_etl.py) has no UDF surface
at all; this is north-star B18.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_words int")
class ChunkText:
    """Fixed-size word chunking — the canonical LLM-pipeline fan-out
    (document → training-window chunks).

    Splits on single spaces (NOT ``str.split()``'s whitespace collapse)
    so the semantics are exactly reproducible in SQL:
    DuckDB ``string_split(text, ' ')`` + index-group + ``string_agg``
    — see workload.B18T_SQL, which the driver hash-checks against this.
    """

    def eval(self, text: str, chunk_size: int):  # noqa: D102
        if text is None or chunk_size is None or chunk_size <= 0:
            return
        words = text.split(" ")
        for i in range(0, len(words), chunk_size):
            piece = words[i : i + chunk_size]
            yield i // chunk_size, " ".join(piece), len(piece)


def register_all(spark) -> None:
    """Register every UDTF in this module on the session catalog so SQL
    can use them via LATERAL."""
    spark.udtf.register("chunk_text", ChunkText)
