"""Merge-upsert table flow, approximate-sketch sanity, and the custom
stateful streaming operator (state persists across restarts)."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from e_commerce_lakehouse_spark.operators import upsert
from e_commerce_lakehouse_spark.sources import load_table
from e_commerce_lakehouse_spark.streaming import events as se
from tests.conftest import SF_SMALL


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="upsert_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_merge_into_parquet_roundtrip(spark, tmpdir):
    path = f"{tmpdir}/tbl"
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.filter(F.col("o_orderkey") <= 1000)
    n0 = upsert.merge_into_parquet(spark, base, path, ["o_orderkey"])
    assert n0 == base.count()
    # update half + insert new keys
    updates = orders.filter(F.col("o_orderkey").between(500, 1500)).withColumn(
        "o_totalprice", F.lit(42.0)
    )
    n1 = upsert.merge_into_parquet(spark, updates, path, ["o_orderkey"])
    merged = spark.read.parquet(path)
    assert n1 == merged.count()
    # keys union, updated rows carry the new price, untouched rows keep old
    assert n1 == orders.filter(F.col("o_orderkey") <= 1500).count()
    assert (
        merged.filter(F.col("o_orderkey").between(500, 1500))
        .filter(F.col("o_totalprice") != 42.0)
        .count()
        == 0
    )
    assert merged.filter((F.col("o_orderkey") < 500) & (F.col("o_totalprice") == 42.0)).count() == 0


def test_approx_sketches_close_to_exact(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))
        .collect()
    }
    exact = {
        r["l_returnflag"]: r["exact"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.1  # HLL default rsd ~5%
    p50 = li.agg(F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p")).first()["p"]
    lo, hi = li.approxQuantile("l_extendedprice", [0.4, 0.6], 0.01)
    assert lo <= p50 <= hi


RAW_SCHEMA = StructType([StructField("value", StringType())])


def _write_batch(path: str, fname: str, rows):
    with open(f"{path}/{fname}", "w") as f:
        for r in rows:
            f.write(json.dumps({"value": json.dumps(r)}) + "\n")


def test_stateful_running_totals_across_restarts(spark, tmpdir):
    """applyInPandasWithState: per-user totals accumulate across two
    separate availableNow runs sharing a checkpoint (state store
    round-trip, the thing batch aggregation can't do)."""
    import os

    src, ckpt = f"{tmpdir}/src", f"{tmpdir}/ck"
    os.makedirs(src)
    ev = lambda i, uid, val: {  # noqa: E731
        "event_id": f"e{i}",
        "timestamp": f"2024-01-01 10:{i:02d}:00",
        "user_id": uid,
        "product_id": "p1",
    }
    _write_batch(src, "b1.json", [ev(0, "7", 0), ev(1, "7", 0), ev(2, "8", 0)])

    out: dict[int, tuple[int, int]] = {}

    def run_once(qname):
        # memory sink can't recover from a checkpoint; foreachBatch can
        out.clear()

        def capture(batch_df, _bid):
            for r in batch_df.collect():
                out[r["user_id"]] = (r["n_events"], r["total_value"])

        raw = spark.readStream.schema(RAW_SCHEMA).json(src)
        parsed = (
            se.parse_raw_events(raw, "page_view")
            .withColumn("user_id", F.col("user_id").cast("long"))
            .withColumn("value", F.lit(1.5))
            .withColumnRenamed("event_time", "ts")
        )
        totals = se.running_user_totals(parsed)
        q = (
            totals.writeStream.foreachBatch(capture)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return dict(out)

    got1 = run_once("state_t1")
    assert got1[7] == (2, 300)  # 2 × 1.50 in cents
    assert got1[8] == (1, 150)

    _write_batch(src, "b2.json", [ev(3, "7", 0)])
    got2 = run_once("state_t2")
    assert got2[7] == (3, 450)  # state carried across the restart
