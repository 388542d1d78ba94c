from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbigdata_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------
# Fast/full split (round 12, VERDICT r11 item 6).  The 540-test full
# suite runs ~34 minutes, past any interactive or CI-slice budget, so a
# <5-minute CORE gate exists:
#
#     pytest tests/ -m "not slow" -q      # core gate, <5 min
#     pytest tests/ -q                    # full gate (the real one)
#
# 'slow' is applied three ways: (1) inline @pytest.mark.slow on tests
# that are slow by design (the 2M IVF-PQ harness test); (2) every
# nodeid in tests/slow_manifest.txt — the measured >=5s tests from the
# round-12 duration run; (3) the parametrized cross-engine differential
# suite in test_oracle.py (test_query_matches_oracle / window-vacuous /
# rows-only) — ~200 Spark-vs-DuckDB executions that the DRIVER's own
# correctness gate re-runs externally every round; the core gate keeps
# test_oracle's cheap structural contracts (window set, registry
# counts, bench-list pins).  The full suite remains the merge gate —
# the core gate exists for tight iteration loops, not as a substitute.
# ---------------------------------------------------------------------
_ORACLE_DIFFERENTIAL_TESTS = (
    "test_query_matches_oracle",
    "test_driver_window_query_is_not_vacuous",
    "test_rows_only_queries_run",
)


def _slow_manifest() -> set[str]:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "slow_manifest.txt")
    with open(path) as f:
        return {
            line.strip() for line in f
            if line.strip() and not line.startswith("#")
        }


def pytest_collection_modifyitems(config, items):
    manifest = _slow_manifest()
    slow = pytest.mark.slow
    for item in items:
        if item.nodeid in manifest or any(
            item.nodeid.split("::")[-1].startswith(f"{t}[")
            for t in _ORACLE_DIFFERENTIAL_TESTS
        ):
            item.add_marker(slow)


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="etlbigdata_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
