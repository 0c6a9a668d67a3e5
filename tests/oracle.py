"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle on the same parquet tables, compare row count, schema
(column names), and values (order-insensitive, exact)."""

from __future__ import annotations

import duckdb
import pandas as pd


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # unify datetime resolutions (Spark→pandas gives ns, DuckDB us;
        # with NaT present pandas compares raw ints across resolutions)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def _dtype_class(dtype) -> str:
    """Coarse dtype class used for parity: the driver's value hash is
    type-sensitive (int64 123 != float64 123.0), so the local gate must
    reject class drift (e.g. DuckDB HUGEINT -> pandas float64) even when
    values match numerically.  Bit width within a class is tolerated
    (Spark int32 vs DuckDB int64 hash identically after numeric coercion)."""
    s = str(dtype)
    if s.startswith("datetime64"):
        return "datetime"
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s in ("bool", "boolean"):
        return "bool"
    return "object"


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"columns differ:\n spark={list(got.columns)}\n oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count differs: spark={len(got)} oracle={len(want)}"
    mismatched = [
        (c, str(got[c].dtype), str(want[c].dtype))
        for c in got.columns
        if _dtype_class(got[c].dtype) != _dtype_class(want[c].dtype)
    ]
    assert not mismatched, (
        "dtype class differs (spark vs oracle) — the driver's hash is "
        f"type-sensitive and would go RED: {mismatched}"
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
