"""Deterministic integer sketches (engine extension).

Count-min sketch per Cormode & Muthukrishnan 2005 ("An improved data
stream summary: the count-min sketch and its applications") — the
heavy-hitter / frequency-estimation primitive for streams and
multi-pass-averse pipelines. Unlike the engine-specific HLL/KLL
sketches (q33's tolerance-gated branch), CMS is a PURE function of
the hash spec: every cell is an exact integer sum over md5-derived
positions, so estimates are bit-reproducible across engines and the
DuckDB oracle gates them exactly (including the one-sided overcount
error the sketch is defined by).

Scale shape: the build is ONE groupBy over depth x width cell keys —
partial aggregation collapses each task's contribution to at most
depth*width rows regardless of input size, and the final sketch is a
few-KB frame (broadcastable artifact). Estimation broadcasts the
cells onto the query keys. No driver-side counting anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hash64


def countmin_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: (row_idx, col_idx, c) cell counts, one row
    per NON-EMPTY cell (at most depth*width). Each input row
    increments one cell per hash row.

    Two-phase build: rows pre-aggregate to per-KEY weights first (a
    partial-agg groupBy on the key), and only the distinct keys pay
    the depth md5 hashes + explode — hashing work scales with
    |distinct keys|, not |rows| (q33's lineitem branch: 80k md5 calls
    instead of 9.6M at sf0.1). Identical cells by construction; when
    the key cardinality itself is huge the key groupBy still
    partial-aggs map-side and the cell groupBy stays bounded by
    depth*width."""
    pos = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                (_md5_hash64(F.col(key_col).cast("string"), f"cms{i}") % width).alias(
                    "col_idx"
                ),
            )
            for i in range(depth)
        ]
    )
    keyed = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_w"))
    return (
        keyed.select(F.explode(pos).alias("s"), "_w")
        .groupBy(F.col("s.row_idx").alias("row_idx"), F.col("s.col_idx").alias("col_idx"))
        .agg(F.sum("_w").alias("c"))
    )


def countmin_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each key row: est = min over hash
    rows of the key's cell count (0 for a never-touched cell — keys
    absent from the build). The cells frame BROADCASTS onto the keys
    (it is bounded by depth*width); output = keys + ``cms_est``.
    Guaranteed one-sided: cms_est >= the key's true count."""
    ex = keys.select(
        "*",
        F.posexplode(
            F.array(
                *[
                    (_md5_hash64(F.col(key_col).cast("string"), f"cms{i}") % width)
                    for i in range(depth)
                ]
            )
        ).alias("row_idx", "col_idx"),
    )
    joined = ex.join(F.broadcast(cells), ["row_idx", "col_idx"], "left")
    return (
        joined.groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )
