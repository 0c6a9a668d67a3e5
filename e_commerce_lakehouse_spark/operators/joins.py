"""Join operators (SURVEY §2.3).

The reference uses inner equi-joins for fact builds, left joins for dim
enrichment, and an inner-on-projected-keys pseudo-semi-join
(reference: silver_clean_transform.py:72,102-106; gold_transfrom.py:61,81;
bronze_batch_load.py:83-87). The engine exposes the full Spark join
surface plus broadcast-aware helpers.

Scale notes: dimension tables (region/nation/supplier/part at low SF;
region/nation always) are broadcast so fact tables never shuffle for
enrichment. Fact-fact joins shuffle on the join key — at 100 TB,
pre-bucketing both sides on the key (``bucketBy`` at write time) removes
that shuffle entirely; AQE skew-join splits hot keys at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_left(fact: DataFrame, dim: DataFrame, on, broadcast_dim: bool = True) -> DataFrame:
    """Left-join a dimension onto a fact (reference J2). Dimensions are
    broadcast by default — zero shuffle on the fact side."""
    return fact.join(F.broadcast(dim) if broadcast_dim else dim, on, "left")


def fact_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact-fact equi-join (reference J1). Shuffle join on the key;
    AQE picks broadcast automatically when one side turns out small."""
    return left.join(right, on, how)


def semi_join(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """Keep rows of ``df`` whose key appears in ``keys`` (reference J3,
    done there as inner-join-on-projected-keys which can duplicate rows —
    left_semi is the idiomatic, duplicate-free form)."""
    return df.join(keys, on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """Rows of ``df`` with no match in ``keys`` (engine surface beyond
    the reference — needed for 'users with no orders' style BI queries)."""
    return df.join(keys, on, "left_anti")


def supplier_geography(supplier: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """Dim-enrichment chain supplier ⟕ nation ⟕ region — the reference's
    products⟕categories pattern (silver_clean_transform.py:70-79) over
    the testdata geography dims. Both dims broadcast; plan has no
    shuffle at any scale."""
    return (
        supplier
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )
