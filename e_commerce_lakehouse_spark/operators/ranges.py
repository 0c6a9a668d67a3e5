"""Pure range (interval) joins, Spark-first.

Spark has no native range-join optimization: a join whose ONLY
predicate is `s <= p AND p < e` plans as BroadcastNestedLoopJoin (or a
cartesian product) — O(|points|·|intervals|) pair evaluations, the
classic 100 TB cliff. (Databricks' RANGE_JOIN hint solves exactly this
with the same binning idea; open-source Spark users hand-roll it.)

:func:`interval_join_binned` is the standard bucketization rewrite:
pick a bin width W, give every point its single bin `p div W`, explode
every interval to the bins it covers, equi-join on the bin, and apply
the exact predicate as a residual filter. A (point, interval) match
meets in EXACTLY ONE bin — the point's — so no post-join dedup pass is
needed. The join becomes a hash/SMJ equi-join whose key cardinality
the caller controls with W; per-interval fan-out is span/W + 1 and is
bounded IN-PLAN (raise_error), not by a docstring caveat.

q36's clicks-before-purchase is the equi+range sibling (a user-keyed
SMJ with a residual range — Spark handles that shape fine); this
module is for ranges with NO equality key to hang the join on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    max_span_bins: int = 64,
) -> DataFrame:
    """Join every point row to every interval row with
    ``start <= point < end`` (half-open), without a nested-loop join.

    ``point_col``/``start_col``/``end_col`` must be integral (days,
    epoch seconds, ids — any totally ordered integer domain; cast
    upstream). Empty intervals (end <= start) match nothing and are
    dropped. An interval spanning more than ``max_span_bins`` bins
    fails loudly in-plan — the caller picked a bin width that would
    explode the build side; widen ``bin_width`` instead of silently
    multiplying rows.

    Output: all point columns + all interval columns (names must be
    disjoint).
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"point/interval column names overlap: {sorted(overlap)}")
    p, s, e = point_col, start_col, end_col
    pts = points.withColumn("_bin", F.expr(f"CAST(({p}) div {bin_width} AS BIGINT)"))
    # the span guard sits INSIDE the explode's end expression so column
    # pruning cannot optimize it away (a guard on a dropped helper
    # column never executes — found by the DID-NOT-RAISE test)
    last_bin_guarded = (
        f"CASE WHEN (({e}) - 1) div {bin_width} - ({s}) div {bin_width}"
        f" < {max_span_bins}"
        f" THEN CAST((({e}) - 1) div {bin_width} AS BIGINT)"
        " ELSE CAST(raise_error(concat("
        "'interval_join_binned: interval spans ',"
        f" CAST((({e}) - 1) div {bin_width} - ({s}) div {bin_width} + 1"
        " AS STRING),"
        f" ' bins > max_span_bins={max_span_bins}; widen bin_width'))"
        " AS BIGINT) END"
    )
    ivs = intervals.filter(F.col(e) > F.col(s)).withColumn(
        "_bin",
        F.explode(
            F.expr(
                f"sequence(CAST(({s}) div {bin_width} AS BIGINT),"
                f" {last_bin_guarded})"
            )
        ),
    )
    return (
        pts.join(ivs, "_bin")
        .filter((F.col(p) >= F.col(s)) & (F.col(p) < F.col(e)))
        .drop("_bin")
    )
