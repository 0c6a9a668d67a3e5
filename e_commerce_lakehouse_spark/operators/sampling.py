"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent per partitioning — unusable when runs
must be reproducible across cluster sizes. These samplers hash a stable
key (md5, engine-portable) so membership is a pure function of the row:
the same rows are selected on 1 executor or 1000, today or tomorrow.

Scale: pure filters — pushdown-friendly, no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): md5 of the key's string form,
    first 15 hex digits, mod buckets. SQL equivalent:
    CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT) % buckets."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
        % F.lit(buckets)
    )


def deterministic_sample(df: DataFrame, key: str, pct: int) -> DataFrame:
    """Keep rows whose hash bucket < pct (pct in integer percent)."""
    return df.filter(hash_bucket(key) < pct)


def stratified_sample(df: DataFrame, key: str, strata_col: str, rates: dict[str, int], default_pct: int) -> DataFrame:
    """Per-stratum deterministic rates (e.g. keep 50% of English docs,
    10% of the rest) — the corpus-balancing primitive."""
    rate = F.lit(default_pct)
    for value, pct in rates.items():
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(key) < rate)


def train_test_split(df: DataFrame, key: str, test_pct: int = 10) -> tuple[DataFrame, DataFrame]:
    """Disjoint, reproducible split on the hashed key — membership
    never changes when data is appended elsewhere."""
    b = hash_bucket(key)
    return df.filter(b >= test_pct), df.filter(b < test_pct)
