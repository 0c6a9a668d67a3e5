"""Every queries() entry vs its DuckDB oracle at sf0.001 — the local
mirror of the driver's t2 gate (driver runs the same at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tests.oracle import compare, duckdb_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMALL)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_every_query_has_impl():
    for name in ORACLES:
        assert name in QUERIES, f"oracle without query: {name}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_SMALL)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    try:
        compare(QUERIES[name](spark, SF_SMALL), con, ORACLES[name])
    except Exception as exc:  # pragma: no cover - environment-dependent
        # In a full-suite mega-process, DuckDB occasionally fails tiny
        # allocations (address-space pressure next to the long-lived
        # Spark JVM) — an environmental OOM, not a correctness signal:
        # the same rows pass in isolation. Retry ONCE on a fresh
        # connection; any real mismatch re-raises unchanged.
        if "Out of Memory" not in str(exc):
            raise
        fresh = duckdb_connection(SF_SMALL)
        try:
            compare(QUERIES[name](spark, SF_SMALL), fresh, ORACLES[name])
        finally:
            fresh.close()
