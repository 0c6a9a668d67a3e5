"""Quarantine split semantics (dq_report is oracle-gated via q50)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import quality
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_quarantine_split(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    # plant violations: null orderkey for ~1/10, negative quantity for %7
    dirty = li.withColumn(
        "l_orderkey",
        F.when(F.col("l_linenumber") % 10 == 0, F.lit(None)).otherwise(F.col("l_orderkey")),
    ).withColumn(
        "l_quantity",
        F.when(F.col("l_partkey") % 7 == 0, -F.col("l_quantity")).otherwise(F.col("l_quantity")),
    )
    rules = [quality.not_null("l_orderkey"), quality.positive("l_quantity")]
    good, bad = quality.quarantine(dirty, rules)
    assert good.count() + bad.count() == dirty.count()
    assert good.filter(F.col("l_orderkey").isNull() | (F.col("l_quantity") <= 0)).count() == 0
    # reasons name every failed rule
    both = bad.filter(
        F.col("l_orderkey").isNull() & (F.col("l_quantity") <= 0)
    ).first()
    if both is not None:
        assert set(both["dq_reasons"]) == {"l_orderkey_not_null", "l_quantity_positive"}
    # report counts line up with the quarantine
    report = {r["rule"]: r["n_violations"] for r in quality.dq_report(dirty, rules).collect()}
    assert report["l_orderkey_not_null"] == dirty.filter(F.col("l_orderkey").isNull()).count()
    assert report["l_quantity_positive"] == dirty.filter(~(F.col("l_quantity") > 0)).count()


def test_schema_evolution_merge(spark, tmp_path):
    """mergeSchema read across files with evolving schemas (reference
    K3's merge-schema option on gold writes)."""
    p = str(tmp_path / "evolving")
    spark.range(3).selectExpr("id", "id * 2 AS a").write.parquet(p + "/v1")
    spark.range(3).selectExpr("id", "id * 3 AS b").write.parquet(p + "/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(p + "/v1", p + "/v2")
    assert set(merged.columns) == {"id", "a", "b"}
    assert merged.count() == 6
    assert merged.filter(F.col("a").isNull()).count() == 3  # v2 rows lack a
