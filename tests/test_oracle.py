"""Differential oracle: every declared query vs its DuckDB SQL twin
(SURVEY §5.2 item 2) — a local replica of the driver's correctness gate.

Canonicalization mirrors the driver's described compare: columns sorted
by name, rows sorted, floats normalized (round to 9 significant-ish
decimal places), then exact match.
"""

from __future__ import annotations

import math

import pytest

from etlbigdata_spark import workload


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # enough to absorb representation noise, tight enough to catch bugs
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [columns[i] for i in order], out


ORACLE_NAMES = sorted(workload.ORACLE_SQL)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = workload.QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(workload.ORACLE_SQL[name])
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    s_cols, s_rows = _canon_rows(spark_cols, spark_rows)
    d_cols, d_rows = _canon_rows(duck_cols, duck_rows)
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]} (cols {s_cols})"


DRIVER_WINDOW = list(workload.QUERIES)[: workload.DRIVER_WINDOW_SIZE]
WINDOW_ORACLE_NAMES = [n for n in DRIVER_WINDOW if n in workload.ORACLE_SQL]


@pytest.mark.parametrize("name", WINDOW_ORACLE_NAMES)
def test_driver_window_query_is_not_vacuous(spark, name):
    """Anti-regression for the round-2 d01 hole: an oracle-bearing query
    inside the driver's correctness window that returns 0 rows at the
    driver's SF passes its hash check vacuously — the green row proves
    nothing.  Every window query must produce >0 rows at sf0.01."""
    import os

    if not os.path.isdir(workload.DRIVER_SF_DIR):
        pytest.skip("driver-SF testdata not present")
    sdf = workload.QUERIES[name](spark, workload.DRIVER_SF_DIR)
    assert sdf.limit(1).count() > 0, (
        f"{name} returns 0 rows at the driver SF — its oracle hash check is vacuous"
    )


# Round-12 window contract (VERDICT r11 item 1: burn down the
# driver-verification backlog).  The window is pinned as an EXACT set:
# the 12 rows with <3 driver-green rounds (r10/r11 promotions), the 7
# round-9 promotions at exactly 3 green rounds, and ALL 31 oracle rows
# that had never held a driver slot in rounds 1-11 — after this round,
# cumulative driver verification reaches 146/146 oracles.  Rotation
# history lives in COVERAGE.md and git (the accreted per-round
# assertions this test used to carry were folded into the exact-set
# form at the r12 rotation).
EXPECTED_WINDOW = {
    # <3 green rounds, kept
    "evt06_gapfill", "evt07_interpolate", "b37_string_agg",
    "st10_stream_dq_monitor", "t24_shuffle_shards",
    "st15_stream_packed_span_dedup",
    "t20_c4_clean", "t21_chunking", "t22_epoch_mix", "s09_pq_topk",
    "mm04_video_neardup", "t23_packed_span_dedup",
    # round-9 promotions kept at exactly 3 green rounds (t06, b33, b34
    # and evt05 rotated out late in round 12 to give the four newcomers
    # their first-round slots)
    "st14_stream_probe_partition_pruned",
    "b39_stat_aggs",
    "t08_contamination",
    # round-12 newcomers in their first driver round: BM25 lexical
    # retrieval, hybrid RRF fusion, persisted-inverted-index probe,
    # and the streaming bucket-pruned BM25 probe with mid-stream append
    "s10_bm25_topk",
    "s11_hybrid_rrf",
    "s12_bm25_index_probe",
    "st16_stream_bm25_probe",
    # the 31 first-slot promotions
    "q02_min_cost_supplier", "q08_market_share",
    "q09_product_type_profit", "q11_important_parts",
    "q16_supplier_relationship", "q20_heavy_shippers",
    "evt01_time_rollup", "evt02_funnel", "evt03_sessionize",
    "evt04_transitions",
    "st04_sliding", "st07_stream_join", "st08_stream_dedup",
    "d08_containment_pairs",
    "b09_notin", "b14p_posexplode", "b18t_chunk_udtf",
    "b28_percentile", "b29_salted_agg", "b30_salted_join",
    "b32_keep_latest", "b35_histogram", "b36_outliers",
    "t05_fingerprint", "t07_hash_split", "t09_pii_redact",
    "t10_quota_sample", "t11_normalize", "t12_pack_shards",
    "t14_surprisal", "t15_mixture",
}


def test_driver_window_covers_expected_components():
    """The window is a contract: exactly DRIVER_WINDOW_SIZE entries,
    every one oracle-bearing, matching the round-12 rotation set; every
    rotated-out row must remain registered AND oracle-checked."""
    assert len(DRIVER_WINDOW) == workload.DRIVER_WINDOW_SIZE
    assert len(EXPECTED_WINDOW) == workload.DRIVER_WINDOW_SIZE
    assert set(DRIVER_WINDOW) == EXPECTED_WINDOW
    # every window row is oracle-bearing (round-4 rule; b17's RNG query
    # is proven by seed-deterministic pytest instead)
    assert "b17_sample" not in DRIVER_WINDOW
    assert all(n in workload.ORACLE_SQL for n in DRIVER_WINDOW)
    # rotated-out rows stay registered and oracle-checked past the
    # window — spot-pin the round-12 demotions
    for rotated_out in (
        "q01_pricing_summary", "q05_region_revenue",
        "d07_incremental_dedup", "b09_asof", "b09_range",
        "b10_running_sum", "b40_table_diff", "b41_interval_join",
        "b42_drift_psi", "b43_bloom_needle", "d03v_minhash_verified",
        "d04v_simhash_verified", "d06_dup_clusters",
        "d09_semantic_dedup", "d10_duplicated_spans", "evt09_scd2_join",
        "mm01_binary_meta", "mm02_image_neardup", "mm03_audio_neardup",
        "s01_cosine_topk", "s02v_lsh_verified", "s07_prototype_prune",
        "s08_hard_negatives", "st09_stream_incremental_dedup",
        "st11_stream_rollup", "st12_stream_semantic_dedup",
        "st13_stream_probe_appended_index", "t13_repetition",
        "t17_temperature_mix", "t18_novelty", "t19_vocab_overlap",
        "t06_tfidf_topterms", "b33_fuzzy_pairs", "b34_dq_checks",
        "evt05_cohort_retention",
    ):
        assert rotated_out not in DRIVER_WINDOW
        assert rotated_out in workload.QUERIES and rotated_out in workload.ORACLE_SQL


def test_registry_counts_match_documentation():
    """README/COVERAGE cite these exact counts (round-3 verdict flagged
    drift); changing the registry must update the docs with it."""
    assert len(workload.QUERIES) == 163
    assert len(workload.ORACLE_SQL) == 150


# DuckDB types the driver's canonicalization maps differently from the
# Spark types they would be compared against.  The round-8 failure mode:
# DuckDB types SUM(<integer>) as HUGEINT; the driver fetch path renders
# it differently from Spark's BIGINT (e.g. 110.0 vs 110), so rows_match
# and schema_match pass but the value hash fails (t18_novelty, r8's only
# red row).  Our own suite never caught it because fetchall() converts
# HUGEINT to Python int, masking the type.  This lint keeps the count of
# offending output columns at zero across ALL oracles.
_DRIVER_UNSAFE_DUCK_TYPES = (
    "HUGEINT",  # covers UHUGEINT too via substring match
    "UBIGINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
)


def test_no_oracle_output_column_has_driver_unsafe_type(duck):
    """Round-9 lint (VERDICT r8 item 2): no ORACLE_SQL output schema may
    contain HUGEINT or an unsigned DuckDB type — cast integer SUMs with
    CAST(... AS BIGINT) (the T17 discipline, workload.py T17_SQL)."""
    offenders = []
    for name in ORACLE_NAMES:
        rel = duck.sql(workload.ORACLE_SQL[name])
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(bad in t for bad in _DRIVER_UNSAFE_DUCK_TYPES):
                offenders.append((name, col, t))
    assert not offenders, (
        "oracle output columns with driver-unsafe DuckDB types "
        f"(CAST them to BIGINT): {offenders}"
    )


NO_ORACLE = sorted(set(workload.QUERIES) - set(workload.ORACLE_SQL))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = workload.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_bench_headline_is_subset_of_registry():
    """bench.py's HEADLINE list is hand-maintained; a typo'd or renamed
    query would only explode at driver-bench time (KeyError mid-round).
    Keep every headline entry a declared query, with no duplicates."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in workload.QUERIES]
    assert not missing, f"bench HEADLINE names not in registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_bench_exclusion_list_is_pinned():
    """Round-10 (VERDICT r9 item 5): the set of queries excluded from
    the bench headline because their declared face inlines a BUILD step
    or runs deliberately-unscaled proof apparatus is an explicit,
    reasoned registry — this pin makes any addition require the same
    written justification instead of silently growing the set."""
    import bench

    assert set(bench.EXCLUDED_FROM_HEADLINE) == {
        "d03v_minhash_verified",
        "d07_incremental_dedup",
        "d09_semantic_dedup",
        "s09_pq_topk",
        "st15_stream_packed_span_dedup",
        "s12_bm25_index_probe",
        "st16_stream_bm25_probe",
    }
    for name, reason in bench.EXCLUDED_FROM_HEADLINE.items():
        assert name in workload.QUERIES
        assert name not in bench.HEADLINE
        # a reason must be substantive, not a placeholder
        assert isinstance(reason, str) and len(reason) > 40, name
