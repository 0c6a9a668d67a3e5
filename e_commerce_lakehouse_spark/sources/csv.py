"""CSV ingest (reference S5 — load_tables.py:112-123 does CSV→Postgres
COPY; here CSV reads straight into DataFrames with explicit schemas)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """Schema-first CSV scan — no inference pass (an extra full read at
    100 TB), consistent types at the boundary."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
