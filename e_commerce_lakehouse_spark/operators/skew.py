"""Skew mitigation: salting for hot keys (100 TB design surface).

AQE's skew-join splitting handles most cases at runtime
(session.py enables it); salting is the explicit fallback for
  - aggregations where one key holds a large share of all rows, and
  - joins where the build side can't broadcast and one probe key is hot.

Both operators are result-exact: salting only decomposes the
computation (two-phase aggregation / key replication), it never
changes semantics. Use with exact measures (cents, counts) so the
re-aggregation is order-independent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(buckets: int) -> Column:
    """Deterministic-enough uniform salt without touching row content:
    the partition id folded into ``buckets``. Any distribution works —
    correctness never depends on the salt, only balance does."""
    return F.spark_partition_id() % F.lit(buckets)


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partial-aggregates
    hot keys across ``buckets`` reducers, then a tiny second shuffle on
    ``keys`` merges the per-salt partials. Counts come along as
    ``n_rows``. Exact for integer measures."""
    phase1 = (
        df.withColumn("__salt", _salt(buckets))
        .groupBy(*keys, "__salt")
        .agg(
            *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return (
        phase1.groupBy(*keys)
        .agg(
            *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
            F.sum("__n").alias("n_rows"),
        )
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join when ``small`` is too big to broadcast:
    the skewed side gets a salt, the small side is replicated ``buckets``
    times (explode over the salt range), and the join key becomes
    (key, salt) — a hot key now spreads over ``buckets`` reducers.

    Cost: small side shuffles ×buckets — worth it exactly when one
    probe key would otherwise serialize a reducer.
    """
    salted_left = skewed.withColumn("__salt", _salt(buckets))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted_left.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")
