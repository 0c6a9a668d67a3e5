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


def test_dtype_class_drift_fails_gate(spark, con):
    """The round-7 q16 bug class must be unrepresentable: an oracle whose
    uncast SUM(BIGINT) surfaces as HUGEINT (-> pandas float64) while Spark
    emits int64 has identical VALUES but must still fail the local gate,
    because the driver's value hash is type-sensitive."""
    from pyspark.sql import functions as F

    sdf = spark.range(3).agg(F.sum("id").cast("long").alias("s"))
    # DuckDB SUM over BIGINT returns HUGEINT; fetchdf() gives float64.
    assert str(con.execute(
        "SELECT SUM(x) AS s FROM (SELECT CAST(range AS BIGINT) x FROM range(3))"
    ).fetchdf()["s"].dtype) == "float64", "DuckDB HUGEINT premise changed"
    with pytest.raises(AssertionError, match="dtype class differs"):
        compare(sdf, con,
                "SELECT SUM(x) AS s FROM (SELECT CAST(range AS BIGINT) x FROM range(3))")
    # and the CAST convention passes:
    compare(sdf, con,
            "SELECT CAST(SUM(x) AS BIGINT) AS s "
            "FROM (SELECT CAST(range AS BIGINT) x FROM range(3))")
