#!/usr/bin/env python
"""Generate a scaled-up copy of the driver testdata (default: sf0.1 × 10
≈ sf1) for the scale-up evidence run (BASELINE.md growth table).

The driver environment caps testdata at sf0.1 (read-only), so every
sf0.1 ratio is fixed-overhead-dominated; this script manufactures the
missing third growth point on scratch disk.  Replication is
KEY-OFFSET-REWRITTEN so the scaled data keeps the original's relational
and statistical shape instead of degenerating:

* ``lineitem`` / ``orders`` — replica k offsets every orderkey by
  k × (max_orderkey + 1): joins fan out exactly as the original, per-key
  group sizes stay constant (no artificial hot keys), FKs into the
  unscaled dims stay valid.
* ``documents`` — replica k prefixes EVERY token with ``r{k}_`` (and
  offsets doc_id): within-replica dup/near-dup structure is preserved
  exactly, while replicas share no shingles — naive text replication
  would make every doc a 10-way cross-replica near-dup and inflate the
  d02/d03/d04 pair count ~100× (a quadratic artifact, not a scale-up).
  n_chars is recomputed for the rewritten text.
* ``events`` — replica k offsets event_id and user_id: 10× users, each
  with the original per-user session/time structure (session windows and
  stateful per-key aggregates scale by key count, not by depth).
* ``embeddings`` — replica k offsets vec_id; vectors are kept verbatim
  (brute-force cosine top-k cost is corpus-size-linear either way; noted
  so nobody reads replica-tie results as semantically meaningful).
* dims (``region nation customer supplier part``) — copied unchanged.

``--zipf`` additionally REMAPS foreign keys to a Zipf-decaying hot set
(round-5 brief item 1: the uniform replication above deliberately
avoids hot keys, so it can never exercise AQE skew splits, salting, or
the dedup hot-shingle guards on realistic data):

* ``orders.o_custkey`` — ~30% of orders concentrate on the 5 smallest
  custkeys with decaying shares 15/8/4/2/1% (q13-style agg skew).
* ``lineitem.l_orderkey`` — ~15% of line items reassign to the 5
  smallest hot orderkeys (shares 8/4/1.5/1/0.5%): the orders⋈lineitem
  sort-merge join gets build-side key skew AQE must split; q18-style
  per-order groups become multi-100k-row stragglers without it.
* ``lineitem.l_partkey`` / ``l_suppkey`` — ~25% / ~20% to 5 hot
  parts/suppliers (join + agg skew through q02/q09-shaped plans).
* ``events.user_id`` — ~30% to 5 hot users (window/sessionize skew).
* ``documents.text`` — ~20% of docs get a fixed 6-token tail phrase:
  its 3-gram shingles appear in ~20% of the corpus, far beyond
  ``max_doc_freq=50``, so the d02/d03 hot-shingle guards must drop
  them to keep candidate volume subquadratic.

Selection is deterministic (``hash(pk) % 1000`` buckets), hot keys are
the N smallest existing keys, so FKs stay valid and runs reproduce.

Usage: python scripts/make_scaled_sf.py [factor] [src_dir] [out_dir] [--zipf]
Defaults: 10 /root/testdata/sf0.1 /tmp/sfscale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

args = [a for a in sys.argv[1:] if a != "--zipf"]
ZIPF = "--zipf" in sys.argv[1:]
FACTOR = int(args[0]) if len(args) > 0 else 10
SRC = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
OUT = args[2] if len(args) > 2 else "/tmp/sfscale/sf1"

COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]

# (threshold per-mille, rank) pairs: cumulative Zipf-ish decay. A row
# whose hash bucket falls below threshold[i] (and not below an earlier
# one) maps to hot key rank i.
_ZIPF_BUCKETS = {
    "custkey": [150, 230, 270, 290, 300],
    "orderkey": [80, 120, 135, 145, 150],
    "partkey": [130, 195, 225, 240, 250],
    "suppkey": [100, 150, 175, 190, 200],
    "userkey": [150, 230, 270, 290, 300],
}

HOT_PHRASE = "zq0 zq1 zq2 zq3 zq4 zq5"  # tokens absent from the corpus


def zipf_case(con, pk_expr: str, fk_col: str, kind: str, hot_keys: list[int]) -> str:
    """CASE expression remapping ``fk_col`` to ``hot_keys`` for the
    hash-selected fraction of rows, Zipf-decaying across ranks."""
    buckets = _ZIPF_BUCKETS[kind]
    whens = "".join(
        f"WHEN hash({pk_expr}) % 1000 < {t} THEN {hot_keys[i]} "
        for i, t in enumerate(buckets)
    )
    return f"CASE {whens}ELSE {fk_col} END"


def hot_keys(con, table_src: str, col: str, n: int = 5) -> list[int]:
    return [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT {col} FROM {table_src} ORDER BY {col} LIMIT {n}"
        ).fetchall()
    ]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(select_sql: str, t: str) -> None:
        con.sql(f"COPY ({select_sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    for t in COPY_TABLES:
        write(f"SELECT * FROM {src(t)}", t)

    okey_span = con.sql(f"SELECT MAX(o_orderkey) + 1 FROM {src('orders')}").fetchone()[0]
    if ZIPF:
        hot_cust = hot_keys(con, src("customer"), "c_custkey")
        hot_ord = hot_keys(con, src("orders"), "o_orderkey")
        hot_part = hot_keys(con, src("part"), "p_partkey")
        hot_supp = hot_keys(con, src("supplier"), "s_suppkey")
        print(f"zipf hot keys: cust={hot_cust} ord={hot_ord} part={hot_part} supp={hot_supp}")
    write(
        " UNION ALL ".join(
            (
                f"SELECT o_orderkey + {k * okey_span} AS o_orderkey, "
                + (
                    f"{zipf_case(con, f'o_orderkey + {k * okey_span}', 'o_custkey', 'custkey', hot_cust)} AS o_custkey, "
                    if ZIPF
                    else "o_custkey, "
                )
                + f"* EXCLUDE (o_orderkey, o_custkey) FROM {src('orders')}"
            )
            for k in range(FACTOR)
        ),
        "orders",
    )
    # lineitem row-level selector: orderkey alone would move whole orders;
    # mixing in partkey makes the hot-key selection per line item
    li_pk = "l_orderkey * 31 + l_partkey"
    write(
        " UNION ALL ".join(
            (
                f"SELECT "
                + (
                    f"{zipf_case(con, f'{li_pk} + {k * okey_span}', f'l_orderkey + {k * okey_span}', 'orderkey', hot_ord)} AS l_orderkey, "
                    f"{zipf_case(con, f'{li_pk} * 7 + {k * okey_span}', 'l_partkey', 'partkey', hot_part)} AS l_partkey, "
                    f"{zipf_case(con, f'{li_pk} * 13 + {k * okey_span}', 'l_suppkey', 'suppkey', hot_supp)} AS l_suppkey, "
                    if ZIPF
                    else f"l_orderkey + {k * okey_span} AS l_orderkey, l_partkey, l_suppkey, "
                )
                + f"* EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM {src('lineitem')}"
            )
            for k in range(FACTOR)
        ),
        "lineitem",
    )

    doc_span = con.sql(f"SELECT MAX(doc_id) + 1 FROM {src('documents')}").fetchone()[0]

    def doc_text(base: str, new_id: str) -> str:
        """In zipf mode ~20% of docs get the fixed hot-phrase tail: its
        shingles appear in ~20% of the corpus >> max_doc_freq, so the
        d02/d03 guards must drop them to stay subquadratic."""
        if not ZIPF:
            return base
        return f"CASE WHEN hash({new_id}) % 1000 < 200 THEN {base} || ' {HOT_PHRASE}' ELSE {base} END"

    t0 = doc_text("text", "doc_id")
    parts = [
        f"SELECT doc_id, {t0} AS text, lang, source, length({t0}) AS n_chars "
        f"FROM {src('documents')}"
    ]
    for k in range(1, FACTOR):
        tagged = doc_text(f"('r{k}_' || replace(text, ' ', ' r{k}_'))", f"doc_id + {k * doc_span}")
        parts.append(
            f"SELECT doc_id + {k * doc_span} AS doc_id, {tagged} AS text, lang, source, "
            f"length({tagged}) AS n_chars FROM {src('documents')}"
        )
    write(" UNION ALL ".join(parts), "documents")

    vec_span = con.sql(f"SELECT MAX(vec_id) + 1 FROM {src('embeddings')}").fetchone()[0]
    write(
        " UNION ALL ".join(
            f"SELECT vec_id + {k * vec_span} AS vec_id, embedding, label FROM {src('embeddings')}"
            for k in range(FACTOR)
        ),
        "embeddings",
    )

    ev_span, user_span = con.sql(
        f"SELECT MAX(event_id) + 1, MAX(user_id) + 1 FROM {src('events')}"
    ).fetchone()
    hot_users = hot_keys(con, src("events"), "user_id") if ZIPF else None
    write(
        " UNION ALL ".join(
            (
                f"SELECT event_id + {k * ev_span} AS event_id, ts, "
                + (
                    f"{zipf_case(con, f'event_id + {k * ev_span}', f'user_id + {k * user_span}', 'userkey', hot_users)} AS user_id, "
                    if ZIPF
                    else f"user_id + {k * user_span} AS user_id, "
                )
                + f"event_type, value, props FROM {src('events')}"
            )
            for k in range(FACTOR)
        ),
        "events",
    )


if __name__ == "__main__":
    main()
