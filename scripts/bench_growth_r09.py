#!/usr/bin/env python
"""Round-9 dedup growth point: d02/d08 at the next decade (VERDICT r8
item 7).

The dedup family is the suite's dominant cost and grows superlinearly
as a DATA property (candidate pairs ∝ Σ df² over shingle doc-frequency
df): d02 measured 3.95 s at sf1 → 46 s at sf10 (DuckDB 16 → 95 s).
This script pins that the ``max_doc_freq`` guard keeps candidate volume
subquadratic at sf30 — one more decade-step of the trend — with the
candidate-pair counts recorded, not inferred.

Subcommands (each fits a 10-minute wall-clock budget; run them
back-to-back and the per-line JSON accumulates in GROWTH_r09.json):

* ``gendocs [factor] [src] [out]`` — documents-ONLY scaled corpus
  (default 3 × /tmp/sfscale/sf10 → /tmp/sfscale/sf30docs), the same
  replica recipe as make_scaled_sf.py but in a FRESH prefix namespace:
  replica k prefixes every token with ``zz{k}_`` so within-replica dup
  structure is preserved exactly while replicas share no shingles.
  The namespace matters when stacking on an already-scaled corpus:
  sf10's own generation used ``r{k}_``, so re-using ``r1_`` makes the
  new replica 1 of sf10's BASE block alias sf10's INTERNAL replica-1
  block — measured as 11,024 phantom cross-replica d02 pairs (+14%)
  before the fix; ``zz`` is verified absent from the source token
  space and the post-gen d02 run now splits exactly 25,600 pairs per
  replica with zero cross-replica rows.
* ``spark <query> <sf_dir>`` — run d02_jaccard_pairs or
  d08_containment_pairs (min of 2, DataFrame rebuilt per run), plus
  the emitted pair count.
* ``duck <query> <sf_dir>`` — the DuckDB oracle twin, min of 2.
* ``stats <sf_dir>`` — candidate-pair accounting from the shingle
  doc-frequency histogram (n=3 and n=5): kept = Σ C(df,2) for
  df ≤ 50, dropped = Σ C(df,2) for df > 50 — the guard's bill of
  materials.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "GROWTH_r09.json",
)


def emit(obj: dict) -> None:
    line = json.dumps(obj)
    print(line)
    with open(OUT_PATH, "a") as f:
        f.write(line + "\n")


HOT_PHRASE = "zq0 zq1 zq2 zq3 zq4 zq5"  # same tail as make_scaled_sf --zipf


def gendocs(factor: int, src: str, out: str, hot: bool = False) -> None:
    """``hot=True`` additionally appends the fixed 6-token tail to ~20%
    of docs (hash-selected) — its 3-gram shingles then appear in ~20%
    of the corpus, far beyond max_doc_freq=50, so the guard MUST drop
    them or candidate volume goes quadratic (the make_scaled_sf --zipf
    document treatment, reproduced here for the sf30 guard point)."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    s = f"read_parquet('{src}/documents.parquet')"
    doc_span = con.sql(f"SELECT MAX(doc_id) + 1 FROM {s}").fetchone()[0]

    def tail(base: str, new_id: str) -> str:
        if not hot:
            return base
        return (f"CASE WHEN hash({new_id}) % 1000 < 200 "
                f"THEN {base} || ' {HOT_PHRASE}' ELSE {base} END")

    t0sel = tail("text", "doc_id")
    parts = [f"SELECT doc_id, {t0sel} AS text, lang, source, "
             f"length({t0sel}) AS n_chars FROM {s}"]
    for k in range(1, factor):
        tagged = tail(f"('zz{k}_' || replace(text, ' ', ' zz{k}_'))",
                      f"doc_id + {k * doc_span}")
        parts.append(
            f"SELECT doc_id + {k * doc_span} AS doc_id, {tagged} AS text, "
            f"lang, source, length({tagged}) AS n_chars FROM {s}"
        )
    t0 = time.perf_counter()
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' "
        "(FORMAT PARQUET)"
    )
    n = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]
    emit({"op": "gendocs", "factor": factor, "out": out, "rows": n,
          "hot": hot, "gen_sec": round(time.perf_counter() - t0, 2)})


def spark_run(query: str, sf_dir: str) -> None:
    from etlbigdata_spark import workload
    from etlbigdata_spark.session import build_session

    spark = build_session(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    n_pairs = workload.QUERIES[query](spark, sf_dir).count()  # warm + count
    times = []
    for _ in range(int(os.environ.get("GROWTH_RUNS", "2"))):
        t0 = time.perf_counter()
        workload.QUERIES[query](spark, sf_dir).toPandas()
        times.append(round(time.perf_counter() - t0, 2))
    emit({"op": "spark", "query": query, "sf_dir": sf_dir,
          "pairs": n_pairs, "times": times, "min_sec": min(times)})


def duck_run(query: str, sf_dir: str) -> None:
    import duckdb

    from etlbigdata_spark import workload

    con = duckdb.connect()
    con.sql(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = workload.ORACLE_SQL[query]
    times = []
    n = None
    if os.environ.get("GROWTH_WARM", "1") != "0":
        n = len(con.sql(sql).fetchall())  # warm + count
    for _ in range(int(os.environ.get("GROWTH_RUNS", "2"))):
        t0 = time.perf_counter()
        n = len(con.sql(sql).fetchall())
        times.append(round(time.perf_counter() - t0, 2))
    emit({"op": "duck", "query": query, "sf_dir": sf_dir,
          "pairs": n, "times": times, "min_sec": min(times)})


def stats(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from etlbigdata_spark.functions import dedup as fdedup
    from etlbigdata_spark.session import build_session
    from etlbigdata_spark.workload import load

    spark = build_session(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    docs = load(spark, sf_dir, "documents")
    out = {"op": "stats", "sf_dir": sf_dir, "docs": docs.count()}
    for n in (3, 5):
        # shingles are already per-doc distinct (array_distinct in
        # _shingle_expr), so (id, shingle) rows are globally distinct —
        # no .distinct() pass needed before the frequency count
        dfreq = (
            fdedup.exploded_shingles(docs, "doc_id", "text", n=n)
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        row = dfreq.agg(
            F.sum(F.when(F.col("df") <= 50, F.col("df") * (F.col("df") - 1) / 2)
                  .otherwise(0)).alias("kept"),
            F.sum(F.when(F.col("df") > 50, F.col("df") * (F.col("df") - 1) / 2)
                  .otherwise(0)).alias("dropped"),
            F.count(F.lit(1)).alias("n_shingles"),
        ).first()
        out[f"n{n}"] = {
            "candidate_pairs_kept": int(row["kept"]),
            "candidate_pairs_dropped_by_guard": int(row["dropped"]),
            "distinct_shingles": int(row["n_shingles"]),
        }
    emit(out)


def main() -> None:
    cmd = sys.argv[1]
    if cmd == "gendocs":
        hot = "--hot" in sys.argv
        argv = [a for a in sys.argv if a != "--hot"]
        factor = int(argv[2]) if len(argv) > 2 else 3
        src = argv[3] if len(argv) > 3 else "/tmp/sfscale/sf10"
        out = argv[4] if len(argv) > 4 else "/tmp/sfscale/sf30docs"
        gendocs(factor, src, out, hot=hot)
    elif cmd == "spark":
        spark_run(sys.argv[2], sys.argv[3])
    elif cmd == "duck":
        duck_run(sys.argv[2], sys.argv[3])
    elif cmd == "stats":
        stats(sys.argv[2])
    else:
        raise SystemExit(f"unknown subcommand {cmd}")


if __name__ == "__main__":
    main()
