"""Plan-quality gates: the physical plans we ship are the plans we
designed — broadcast enrichment, pushdown, pruning, codegen. These
catch regressions where a refactor silently degrades to a shuffle join
or a full-width scan (the 100 TB failure modes)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL

Q = entrymod.queries()


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_broadcasts_dim_and_prunes_columns(spark):
    plan = plan_of(Q["q01_sales_summary"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan  # part dim must broadcast
    # lineitem scan reads only the 5 needed columns of 11
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double,"
        "l_extendedprice:double,l_discount:double>" in plan
    )
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_q08_pushes_priority_filter_to_scan(spark):
    plan = plan_of(Q["q08_urgent_lineitems"](spark, SF_SMALL))
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan  # pushed to parquet scan
    assert "LeftSemi" in plan


def test_q02_scan_width_minimal(spark):
    plan = plan_of(Q["q02_top20_products"](spark, SF_SMALL))
    # top-k must be TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan
    # lineitem scan: only partkey + money columns
    assert (
        "ReadSchema: struct<l_partkey:bigint,l_extendedprice:double,l_discount:double>"
        in plan
    )


def test_q17_single_shuffle_dedup(spark):
    plan = plan_of(Q["q17_exact_dedup"](spark, SF_SMALL))
    # hash-agg dedup: exactly one exchange (partial -> final agg)
    assert plan.count("Exchange") <= 2  # Exchange + AQE wrapper mention
    assert "HashAggregate" in plan


def test_whole_stage_codegen_active(spark):
    # AQE's plan wrappers hide codegen markers until stages materialize;
    # disable AQE momentarily to see the codegen spans in the plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(Q["q04_monthly_sales"](spark, SF_SMALL))
        assert "[codegen id :" in plan  # operators fused into codegen stages
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q24_broadcasts_probe_side(spark):
    plan = plan_of(Q["q24_cosine_topk"](spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_arrow_kernels_evaluate_once(spark):
    """Every Arrow-batched kernel must appear in exactly ONE
    ArrowEvalPython node per logical use. Catalyst duplicates
    deterministic UDF expressions referenced by both a filter and a
    projection (two nodes => two concurrent python workers per task —
    a worker-pool spawn storm); asNondeterministic on the kernels
    prevents it. This gate catches any regression."""
    # q25: signature kernel once + pair-verify kernel once
    plan = plan_of(Q["q25_minhash_lsh_pairs"](spark, SF_SMALL))
    assert plan.count(") ArrowEvalPython") == 2, plan.count(") ArrowEvalPython")
    # q51: band-codes kernel once + pairwise-cosine kernel once
    plan = plan_of(Q["q51_embedding_neardup"](spark, SF_SMALL))
    assert plan.count(") ArrowEvalPython") == 2, plan.count(") ArrowEvalPython")
    # q27: simhash kernel once
    plan = plan_of(Q["q27_simhash"](spark, SF_SMALL))
    assert plan.count(") ArrowEvalPython") == 1, plan.count(") ArrowEvalPython")
