#!/usr/bin/env python
"""t21 growth re-measured through a PARQUET-SINK face (round-10 brief
item 4).

Round-9's 500k-doc growth point read 2.67x vs DuckDB, but its own
decomposition showed chunk COMPUTE is linear (1.05 -> 3.7 s for 10x
docs) and ~26 s of the full-face number was driver-side pandas
construction of the 1.2M-row result — the protocol's transfer-parity
term, not the operator.  Production chunking lands in parquet, never
the driver.  This script re-runs the growth points with BOTH engines
writing their full chunk output to parquet (Spark ``write.parquet``,
DuckDB ``COPY ... TO``), so the fetch term can't dominate:

* 500k docs (10x the sf1 corpus, replica token-prefix namespace ``zz``
  — the bench_growth_r09 gendocs recipe, no hot tail)
* 1.5M docs (30x)

Protocol: min of RUNS per engine per point, engines back-to-back in
one process, loadavg stamps (round-10 noise rule), row counts asserted
equal.  Emits T21_GROWTH_SINK_r10.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "T21_GROWTH_SINK_r10.json")
SRC = os.environ.get("T21_SRC", "/tmp/scaled/sf1")
WORK = os.environ.get("T21_WORK", "/tmp/scaled/t21growth")
RUNS = int(os.environ.get("GROWTH_RUNS", "3"))
FACTORS = [int(x) for x in os.environ.get("T21_FACTORS", "10,30").split(",")]


def gendocs(factor: int, src: str, out: str) -> int:
    """Documents-only scaled corpus, the bench_growth_r09 recipe
    (replica k prefixes every token with ``zz{k}_`` so replicas share
    no shingles; fresh namespace, no hot tail)."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    s = f"read_parquet('{src}/documents.parquet')"
    doc_span = con.sql(f"SELECT MAX(doc_id) + 1 FROM {s}").fetchone()[0]
    parts = [f"SELECT doc_id, text, lang, source, n_chars FROM {s}"]
    for k in range(1, factor):
        t = f"('zz{k}_' || replace(text, ' ', ' zz{k}_'))"
        parts.append(
            f"SELECT doc_id + {k * doc_span} AS doc_id, {t} AS text, "
            f"lang, source, length({t}) AS n_chars FROM {s}"
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' "
        "(FORMAT PARQUET)"
    )
    return con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]


def main() -> None:
    from etlbigdata_spark import workload
    from etlbigdata_spark.session import build_session

    out: dict = {
        "protocol": "full t21 chunk output written to parquet by BOTH engines "
                    f"(no driver fetch), min of {RUNS}; corpora are zz-prefixed "
                    "replicas of the sf1 documents (bench_growth_r09 recipe)",
        "runs": RUNS,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "points": {},
    }
    spark = build_session(
        app_name="t21_growth_sink_r10",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    import duckdb

    for factor in FACTORS:
        sf_dir = f"{WORK}/docs_x{factor}"
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            n = gendocs(factor, SRC, sf_dir)
        else:
            import duckdb as _d
            n = _d.sql(
                f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
            ).fetchone()[0]
        point: dict = {"docs": n}
        sink = f"{WORK}/sink_x{factor}"

        # Spark: write the full chunk face to parquet
        ts = []
        for _ in range(RUNS):
            shutil.rmtree(sink, ignore_errors=True)
            t0 = time.perf_counter()
            workload.QUERIES["t21_chunking"](spark, sf_dir).write.mode(
                "overwrite"
            ).parquet(sink)
            ts.append(round(time.perf_counter() - t0, 2))
        point["spark_sink_sec"] = min(ts)
        point["spark_runs"] = ts
        n_spark = spark.read.parquet(sink).count()

        # DuckDB: COPY the oracle face to parquet
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        dsink = f"{WORK}/duck_x{factor}.parquet"
        ts = []
        for _ in range(RUNS):
            if os.path.exists(dsink):
                os.remove(dsink)
            t0 = time.perf_counter()
            con.sql(
                f"COPY ({workload.ORACLE_SQL['t21_chunking']}) TO '{dsink}' "
                "(FORMAT PARQUET)"
            )
            ts.append(round(time.perf_counter() - t0, 2))
        point["duckdb_sink_sec"] = min(ts)
        point["duckdb_runs"] = ts
        n_duck = con.sql(f"SELECT COUNT(*) FROM read_parquet('{dsink}')").fetchone()[0]
        con.close()

        point["chunks_spark"] = n_spark
        point["chunks_duck"] = n_duck
        point["rows_equal"] = n_spark == n_duck
        point["ratio"] = round(point["spark_sink_sec"] / point["duckdb_sink_sec"], 2)
        out["points"][f"x{factor}"] = point
        print(json.dumps({f"x{factor}": point}), flush=True)

    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps({k: v["ratio"] for k, v in out["points"].items()}))


if __name__ == "__main__":
    main()
