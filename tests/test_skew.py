"""Salting operators: result parity with the unsalted plans on skewed
data (one key holding ~half of all rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.functions.money import cents
from e_commerce_lakehouse_spark.operators import skew
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


def _skewed_lineitem(spark):
    """Make l_suppkey pathologically skewed: map half of all rows to
    supplier 1."""
    li = load_table(spark, SF_SMALL, "lineitem")
    return li.withColumn(
        "l_suppkey",
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1)).otherwise(F.col("l_suppkey")),
    )


def test_salted_sum_parity(spark):
    li = _skewed_lineitem(spark).withColumn("rc", cents("l_extendedprice"))
    direct = {
        (r["l_suppkey"],): (r["s"], r["n"])
        for r in li.groupBy("l_suppkey")
        .agg(F.sum("rc").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r["l_suppkey"],): (r["sum_rc"], r["n_rows"])
        for r in skew.salted_sum(li, ["l_suppkey"], ["rc"], buckets=16).collect()
    }
    assert salted == direct


def test_salted_join_parity(spark):
    li = _skewed_lineitem(spark)
    supp = load_table(spark, SF_SMALL, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    direct = (
        li.join(supp, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        skew.salted_join(li, supp, "l_suppkey", buckets=8)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d = {r["l_suppkey"]: r["n"] for r in direct.collect()}
    s = {r["l_suppkey"]: r["n"] for r in salted.collect()}
    assert s == d
    # left join keeps unmatched skewed rows exactly once per row
    li_left = skew.salted_join(li, supp.filter(F.col("l_suppkey") <= 3), "l_suppkey", how="left")
    assert li_left.count() == li.count()
