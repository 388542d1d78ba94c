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


def test_driver_window_covers_expected_components():
    """The window is a contract: exactly DRIVER_WINDOW_SIZE entries, and
    the round-3 additions (st03 watermark twin, s02v verified ANN) sit
    inside it."""
    assert len(DRIVER_WINDOW) == workload.DRIVER_WINDOW_SIZE
    for required in (
        "s02v_lsh_verified",
        "d04v_simhash_verified",
        "d06_dup_clusters",
        # round-5 rotation: the flagship plans now spend driver slots
        "q05_region_revenue",
        "d07_incremental_dedup",
        # round-6 rotation: never-windowed components now spend slots
        # (evt08_scd2 rotated out in r10 after 4 green rounds)
        "st09_stream_incremental_dedup",
        "t13_repetition",
        # late round-6: the oracle-backed image-dedup face (real codec
        # chain under a SQL ground truth) takes b27_profile's slot
        "mm02_image_neardup",
        # late round-6: the two new dedup modes prove themselves at the
        # driver gate in their first round (b09_anti/b15_json demoted —
        # redundant family rows, five driver-green rounds)
        "d09_semantic_dedup",
        "d10_duplicated_spans",
        # round-7 rotation (VERDICT r6 item 8): never-windowed
        # oracle-proven rows promoted, plus the new st13 append-
        # visibility proof in its first round
        "b41_interval_join",
        "b42_drift_psi",
        "evt09_scd2_join",
        "s07_prototype_prune",
        "mm03_audio_neardup",
        "st12_stream_semantic_dedup",
        "st13_stream_probe_appended_index",
        # round-8 rotation (VERDICT r7 item 6): never-windowed
        # oracle-proven rows promoted, plus the new b43 bloom-filter
        # needle-lookup face in its first round
        "b40_table_diff",
        "b43_bloom_needle",
        "t17_temperature_mix",
        "t18_novelty",
        "t19_vocab_overlap",
        "s08_hard_negatives",
        "st11_stream_rollup",
        # round-9 rotation (VERDICT r8 item 6): never-windowed
        # oracle-proven rows promoted, led by st14 — the r8-new
        # partition-pruned streaming ANN probe's first driver slot
        "st14_stream_probe_partition_pruned",
        "b33_fuzzy_pairs",
        "b34_dq_checks",
        "b39_stat_aggs",
        "evt05_cohort_retention",
        "t06_tfidf_topterms",
        "t08_contamination",
        # round-10 rotation (VERDICT r9 item 1): the five round-9
        # continuation rows take their first driver slots
        "t20_c4_clean",
        "t21_chunking",
        "t22_epoch_mix",
        "s09_pq_topk",
        "mm04_video_neardup",
        # round-10 new op (VERDICT r9 item 7): packed-shard span dedup
        # proves itself at the driver gate in its first round
        "t23_packed_span_dedup",
        # round-11 rotation (VERDICT r10 item 5): four never-slotted
        # oracle-proven rows promoted, plus the two round-11 newcomers
        # in their first driver round
        "evt06_gapfill",
        "evt07_interpolate",
        "b37_string_agg",
        "st10_stream_dq_monitor",
        "t24_shuffle_shards",
        "st15_stream_packed_span_dedup",
    ):
        assert required in DRIVER_WINDOW
    # rotations: rows demoted after multiple driver-green rounds stay
    # oracle-checked past the window (r5: a09/a12/a13; r6: a07/a10/a11/
    # a15, then b27_profile for mm02, then b09_anti/b15_json for d09/d10)
    for rotated_out in (
        "a09_count", "a12_transpose", "a13_split_merge",
        "a07_fill_nulls", "a10_replace", "a11_filter_contains", "a15_cast",
        "b27_profile", "b09_anti", "b15_json",
        # r7: the scalar-function family (5+ driver-green rounds each)
        "b11_strings", "b12_dates", "b13_math", "b14_arrays",
        "b15_from_json", "b16_pivot", "b18_pandas_udf",
        # r8: a-series/streaming long-green rows (5-7 rounds each)
        "a06_union_all", "a08_dedup", "a16_join", "b08_intersect",
        "st01_tumbling", "st02_sessions", "st03_watermark",
        # r9: the relational core (7-8 driver-green rounds each)
        "b01_sql", "b02_projection", "b03_general_filter",
        "b05_count_distinct", "b06_grouping_sets", "b07_topk_group",
        "t02_token_count",
        # r10: long-green rows freeing slots for t20/t21/t22/s09/mm04
        # (b33 kept in-window — only one green round since its r9
        # promotion; t03 rotates in its place per the 4+-round rule)
        "a01_csv_scan", "b10_ranks", "evt08_scd2",
        "t01_text_stats", "t03_quality", "t04_language_id",
        # r11: long-green rows (5-8 driver rounds) freeing slots for
        # evt06/evt07/b37/st10/t24/st15
        "b31_merge_upsert", "q21_sole_failing_supplier",
        "d01_dup_groups", "d02_jaccard_pairs",
        "st05_stream_replay", "st06_stateful",
    ):
        assert rotated_out not in DRIVER_WINDOW
        assert rotated_out in workload.QUERIES and rotated_out in workload.ORACLE_SQL
    # round-4: every window row is oracle-bearing (b17's RNG query was
    # demoted; its component is proven by seed-deterministic pytest)
    assert "b17_sample" not in DRIVER_WINDOW
    assert all(n in workload.ORACLE_SQL for n in DRIVER_WINDOW)


def test_registry_counts_match_documentation():
    """README/COVERAGE cite these exact counts (round-3 verdict flagged
    drift); changing the registry must update the docs with it."""
    assert len(workload.QUERIES) == 159
    assert len(workload.ORACLE_SQL) == 146


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
    }
    for name, reason in bench.EXCLUDED_FROM_HEADLINE.items():
        assert name in workload.QUERIES
        assert name not in bench.HEADLINE
        # a reason must be substantive, not a placeholder
        assert isinstance(reason, str) and len(reason) > 40, name
