"""Catalog surface (create-or-replace / drop / exists / inspect) and
the bucketed-join zero-shuffle plan gate."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.sources import catalog, load_table
from tests.conftest import SF_SMALL


def test_create_or_replace_and_inspect(spark):
    nation = load_table(spark, SF_SMALL, "nation")
    catalog.create_or_replace(spark, nation, "t_nation")
    assert catalog.table_exists(spark, "t_nation")
    # replace with a subset — createOrReplace semantics (reference K2)
    catalog.create_or_replace(spark, nation.filter(F.col("n_regionkey") == 0), "t_nation")
    assert spark.table("t_nation").count() == 5
    info = {t["table"]: t for t in catalog.inspect_tables(spark)}
    key = next(k for k in info if k.endswith("t_nation"))
    assert info[key]["rows"] == 5
    assert "n_name:string" in info[key]["schema"]
    catalog.drop_table(spark, "t_nation")
    assert not catalog.table_exists(spark, "t_nation")


def test_append_evolve_merges_schema(spark):
    """Schema-evolving append (reference gold merge-schema write,
    gold_transfrom.py:73,92): write v1, append v2 with an extra column,
    read both generations through the union schema with null-fill."""
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v2 = spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    )
    catalog.drop_table(spark, "t_evolve")
    catalog.append_evolve(spark, v1, "t_evolve")
    catalog.append_evolve(spark, v2, "t_evolve")
    got = {r["id"]: (r["name"], r["score"]) for r in spark.table("t_evolve").collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}
    # appending a frame MISSING a column also works (null-filled)
    catalog.append_evolve(
        spark, spark.createDataFrame([(4,)], "id long"), "t_evolve"
    )
    got = {r["id"]: (r["name"], r["score"]) for r in spark.table("t_evolve").collect()}
    assert got[4] == (None, None) and len(got) == 4
    # same-schema appends stay plain appends (no rewrite needed)
    catalog.append_evolve(
        spark,
        spark.createDataFrame([(5, "e", 1.0)], "id long, name string, score double"),
        "t_evolve",
    )
    assert spark.table("t_evolve").count() == 5
    catalog.drop_table(spark, "t_evolve")


def test_bucketed_join_has_no_shuffle(spark):
    """Both sides bucketed on the join key → SortMergeJoin with NO
    Exchange in the plan (the 100 TB fact-fact join strategy)."""
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    catalog.save_bucketed(
        spark, orders, "b_orders", ("o_orderkey",), num_buckets=4, sort_cols=("o_orderkey",)
    )
    catalog.save_bucketed(
        spark,
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ("o_orderkey",),
        num_buckets=4,
        sort_cols=("o_orderkey",),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        j = spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
        agg = j.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
        buf = io.StringIO()
        with redirect_stdout(buf):
            agg.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "Bucketed: true" in plan
        assert agg.count() == spark.table("b_lineitem").select("o_orderkey").distinct().count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        catalog.drop_table(spark, "b_orders")
        catalog.drop_table(spark, "b_lineitem")
