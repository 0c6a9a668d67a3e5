"""Cleaning / normalization operators (SURVEY §2.2, §2.6).

Silver-layer hygiene re-expressed on the testdata schema. The reference
normalizes emails with lower∘trim, builds full_name (with a `+`-on-
Columns bug — we implement the intent via concat_ws), validates ranges,
and dedups by key (reference: silver_clean_transform.py:85-95,
:74,88,105,117-118).

All expressions are built-in Column functions — JVM-side, inside
whole-stage codegen; no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """lower(trim(x)) — the reference's email normalization
    (silver_clean_transform.py:89)."""
    return F.lower(F.trim(F.col(col) if isinstance(col, str) else col))


def full_name(first: Column | str, last: Column | str) -> Column:
    """concat_ws(' ', trim(first), trim(last)).

    The reference writes `trim(first) + " " + trim(last)`
    (silver_clean_transform.py:90) which is numeric addition on string
    Columns and yields NULL — we implement the documented intent.
    """
    first = F.col(first) if isinstance(first, str) else first
    last = F.col(last) if isinstance(last, str) else last
    return F.concat_ws(" ", F.trim(first), F.trim(last))


def valid_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """rating.between(1,5)-style validation (silver_clean_transform.py:118)."""
    return df.filter(F.col(col).between(lo, hi))


def non_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Conjunction of isNotNull guards (silver_clean_transform.py:73,117)."""
    pred = F.lit(True)
    for c in cols:
        pred = pred & F.col(c).isNotNull()
    return df.filter(pred)


def positive(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(quantity > 0) & (price > 0) guards (silver_clean_transform.py:105)."""
    pred = F.lit(True)
    for c in cols:
        pred = pred & (F.col(c) > 0)
    return df.filter(pred)


def dedup_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Non-deterministic first-row dedup — the reference's
    dropDuplicates([...]) (silver_clean_transform.py:74,88). Prefer
    :func:`dedup_latest` when a tiebreak ordering exists."""
    return df.dropDuplicates(list(keys))


def dedup_latest(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[Column]
) -> DataFrame:
    """Deterministic keep-latest dedup: row_number over a window
    partitioned by ``keys`` ordered by ``order_cols`` (desc ts + unique
    tiebreak), keep rank 1 (SURVEY P10 deterministic variant).

    Scale: one shuffle on ``keys``; with AQE skew handling hot keys
    split. For 100 TB, this beats dropDuplicates because the window sort
    is per-key and spills gracefully.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change stream: one
    validity interval per (key, change), valid_to = next change's ts
    (NULL while current). Built with lead() over the per-key timeline —
    one shuffle on the key (engine extension; the reference drops and
    recreates dims wholesale each run instead of versioning them).
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    out = df.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def fill_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """coalesce-based null repair (reference imports coalesce but never
    uses it — silver_clean_transform.py:7; realized here)."""
    for c, v in defaults.items():
        df = df.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return df
