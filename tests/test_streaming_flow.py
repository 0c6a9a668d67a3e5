"""Full streaming-flow composition: 4 event types fan out, serving
types branch to two sinks on shared lineage, everything checkpoints."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from e_commerce_lakehouse_spark.streaming import flow

RAW_SCHEMA = StructType([StructField("value", StringType())])


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="flow_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events_for(etype: str, n: int):
    base = {
        "page_view": {"product_id": "p1"},
        "add_to_cart": {"product_id": "p2", "quantity": 1},
        "purchase": {"product_id": "p3", "quantity": 2, "price": 9.99},
        "review": {"product_id": "p4", "rating": 5, "review_text": "ok"},
    }[etype]
    return [
        {
            "event_id": f"{etype}-{i}",
            "timestamp": f"2024-01-01 12:{i:02d}:00",
            "user_id": f"u{i % 2}",
            **base,
        }
        for i in range(n)
    ]


def test_full_fanout_flow(spark, tmpdir):
    srcs = {}
    for etype in flow.ALL_TYPES:
        d = f"{tmpdir}/src/{etype}"
        os.makedirs(d)
        with open(f"{d}/events.json", "w") as f:
            for e in _events_for(etype, 6):
                f.write(json.dumps({"value": json.dumps(e)}) + "\n")
        srcs[etype] = d

    store_dir = f"{tmpdir}/store"
    os.makedirs(store_dir)

    class FileStore:
        def __init__(self, path):
            self.path = path

        def push(self, user_id, kind, product_ids, expire_seconds=86400):
            assert expire_seconds == 86400  # reference 24h EXPIRE carried
            with open(f"{self.path}/{kind}_{user_id}", "a") as f:
                f.write(",".join(product_ids) + "\n")

    queries = flow.start_event_flows(
        source_factory=lambda e: spark.readStream.schema(RAW_SCHEMA).json(srcs[e]),
        bronze_root=f"{tmpdir}/bronze",
        checkpoint_root=f"{tmpdir}/ck",
        store_factory=lambda: FileStore(store_dir),
        available_now=True,
    )
    # 4 bronze + 2 serving sinks
    assert len(queries) == 6
    for q in queries:
        q.awaitTermination(120)

    for etype in flow.ALL_TYPES:
        got = spark.read.parquet(f"{tmpdir}/bronze/{etype}")
        assert got.count() == 6
        assert got.filter(got.event_type == etype).count() == 6
    # purchase schema carried its typed extras through the parse
    purchase = spark.read.parquet(f"{tmpdir}/bronze/purchase")
    assert purchase.schema["price"].dataType.typeName() == "double"
    # serving sinks wrote recency lists for both users and both kinds
    files = sorted(os.listdir(store_dir))
    assert files == ["cart_u0", "cart_u1", "views_u0", "views_u1"]
    # newest-first order from the recency window
    assert open(f"{store_dir}/views_u0").read().strip().split(",")[0] == "p1"
