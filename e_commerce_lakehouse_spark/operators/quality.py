"""Data-quality checks + quarantine (SURVEY §5: the reference declares
pydeequ in airflow/requirements.txt but never imports it — the intent,
realized Spark-natively).

A rule is (name, Column predicate). Two surfaces:
  - `dq_report`: one row per rule with pass/violation counts — a single
    aggregate pass over the data (conditional counts, no shuffle
    beyond the final 1-row-per-rule agg).
  - `quarantine`: split the frame into (good, bad-with-reasons) so
    pipelines can load clean rows and park the rest — the silver-layer
    guard (silver_clean_transform.py:73,105,117-118) generalized.

Scale: both are single-pass maps + one tiny aggregation; reasons are
computed with array ops, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = tuple[str, Column]


def not_null(col: str) -> Rule:
    return (f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return (f"{col}_between_{lo}_{hi}", F.col(col).between(lo, hi))


def positive(col: str) -> Rule:
    return (f"{col}_positive", F.col(col) > 0)


def matches(col: str, pattern: str, name: str | None = None) -> Rule:
    return (name or f"{col}_matches", F.col(col).rlike(pattern))


def dq_report(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Per-rule violation counts in ONE aggregate pass."""
    aggs = []
    for name, pred in rules:
        aggs.append(
            F.sum(F.when(pred, 0).otherwise(1)).alias(f"__viol_{name}")
        )
    row = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    # unpivot to (rule, total, violations, pass_rate)
    pairs = []
    for name, _ in rules:
        pairs.append(
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__total").alias("n_rows"),
                # backticks: rule names may contain dots (e.g. range bounds)
                F.col(f"`__viol_{name}`").alias("n_violations"),
            )
        )
    return (
        row.select(F.explode(F.array(*pairs)).alias("r"))
        .select("r.rule", "r.n_rows", "r.n_violations")
        .withColumn(
            "pass_rate",
            (F.col("n_rows") - F.col("n_violations")).cast("double") / F.col("n_rows"),
        )
    )


def quarantine(df: DataFrame, rules: Sequence[Rule]) -> tuple[DataFrame, DataFrame]:
    """(good_rows, bad_rows_with_reasons). A row is bad if ANY rule
    fails; `dq_reasons` lists every failed rule name."""
    reasons = F.filter(
        F.array(
            *[
                F.when(~pred | pred.isNull(), F.lit(name)).otherwise(F.lit(None))
                for name, pred in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("dq_reasons", reasons)
    good = tagged.filter(F.size("dq_reasons") == 0).drop("dq_reasons")
    bad = tagged.filter(F.size("dq_reasons") > 0)
    return good, bad


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """ANALYZE-style column profile: (column, n_rows, n_nulls,
    n_distinct) per requested column, EXACT counts.

    Built as one stacked melt — (column, value-as-string) pairs —
    aggregated in ONE pass: groupBy (column, v) counts (uniform keys,
    map-side combinable), then a tiny per-column rollup derives rows /
    nulls / NDV from the value-count frame. One source scan, no Spark
    count(DISTINCT a), count(DISTINCT b), ... Expand rewrite (which
    duplicates every input row once per distinct aggregate). The
    string cast is injective for the supported types (ints, strings,
    dates), so distinct strings == distinct values; profile doubles
    only if you accept formatting as identity."""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.column", "s.v")
    vcounts = stacked.groupBy("column", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    return vcounts.groupBy("column").agg(
        F.sum("c").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("v").isNull(), F.col("c"))), F.lit(0)
        ).alias("n_nulls"),
        F.count(F.when(F.col("v").isNotNull(), F.lit(1))).alias(
            "n_distinct"
        ),
    )
