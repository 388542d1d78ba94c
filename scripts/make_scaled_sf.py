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

Usage: python scripts/make_scaled_sf.py [factor] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /tmp/sfscale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfscale/sf1"

COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]


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
    write(
        " UNION ALL ".join(
            f"SELECT o_orderkey + {k * okey_span} AS o_orderkey, * EXCLUDE (o_orderkey) "
            f"FROM {src('orders')}"
            for k in range(FACTOR)
        ),
        "orders",
    )
    write(
        " UNION ALL ".join(
            f"SELECT l_orderkey + {k * okey_span} AS l_orderkey, * EXCLUDE (l_orderkey) "
            f"FROM {src('lineitem')}"
            for k in range(FACTOR)
        ),
        "lineitem",
    )

    doc_span = con.sql(f"SELECT MAX(doc_id) + 1 FROM {src('documents')}").fetchone()[0]
    parts = [f"SELECT * FROM {src('documents')}"]
    for k in range(1, FACTOR):
        tagged = f"'r{k}_' || replace(text, ' ', ' r{k}_')"
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
    write(
        " UNION ALL ".join(
            f"SELECT event_id + {k * ev_span} AS event_id, ts, user_id + {k * user_span} AS user_id, "
            f"event_type, value, props FROM {src('events')}"
            for k in range(FACTOR)
        ),
        "events",
    )


if __name__ == "__main__":
    main()
