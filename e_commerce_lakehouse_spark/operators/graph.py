"""Clickstream-graph operators: transition-edge derivation and an
integer-exact PageRank.

The reference has no graph tier; this extends the engine the way its
recommendation surface (reference scripts/spark_jobs/streaming_flow.py
rerank) would grow next: item-to-item transition graphs from event
streams, ranked by a random-surfer model.

Determinism at scale: classic PageRank sums doubles, and floating-point
addition is not associative — shuffle order changes low bits run to
run. Here every quantity is an integer in 1e-12 "rank units"
(floor divisions, exact integer sums), so results are bit-identical
across partitionings, engines, and reruns — the same strategy as the
engine's money/cosine math, and what makes an unrolled SQL oracle
possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RANK_SCALE = 10**12  # rank mass is tracked in 1e-12 units


def click_edges(events: DataFrame) -> DataFrame:
    """Directed item-transition edges from the event log: for each user,
    order events by (ts, event_id) — micros + unique id, so the order is
    total and engine-portable — and emit (prev item → item) for every
    consecutive pair with distinct items. DISTINCT: the simple directed
    graph, not the multigraph.

    One window shuffle on user_id + one distinct; at 100 TB both hash
    uniformly (user_id is high-cardinality, edges are bounded by
    items²)."""
    from .parallelize import spread_for_cpu

    # get_json_object is regex-backed per-row parsing — don't let a
    # single-split scan serialize it ahead of the window shuffle
    events = spread_for_cpu(events)
    ev = events.select(
        "user_id",
        "event_id",
        "ts",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev", F.lag("item").over(w))
    return (
        seq.filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("item")))
        .select(F.col("prev").alias("src"), F.col("item").alias("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    scale: int = RANK_SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Fixed-iteration PageRank over (src, dst) edges, all-integer:

        r0[v]   = scale div N
        share[u]= r[u] div outdeg[u]
        r'[v]   = (damp_den-damp_num)*scale div (damp_den*N)
                  + (damp_num * Σ_in share) div damp_den

    Dangling mass is dropped (the standard simplification) and nodes
    with no in-edges keep only the teleport term. Integer sums are
    associative, so the result is independent of shuffle order —
    deterministic enough to hash-compare against an unrolled SQL oracle.

    Distribution: edges/nodes/degrees materialize once (localCheckpoint
    — they are re-joined every round); each round is one join + one
    groupBy shuffled on uniform node keys. N (the node count) is the
    only driver-side value — a scalar, like any iterative-ML state.
    """
    from .parallelize import local_checkpoint_tracked, release_rdds

    spark = edges.sparkSession
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    n = nodes.count()
    teleport = ((damp_den - damp_num) * scale) // (damp_den * n)
    r = nodes.withColumn("r", F.lit(scale // n))
    # r's plan otherwise deepens by two joins per round: harmless at the
    # default 2 iterations, quadratic Catalyst analysis by ~50. Cut the
    # lineage every few rounds and release the checkpoint the cut
    # supersedes (values are unchanged — the math is integer-exact).
    ckpt_every = 8
    r_ids: set[int] = set()
    for it in range(iters):
        contrib = (
            edges.join(r, edges.src == r.node)
            .join(deg, "src")
            .select("dst", F.expr("r div deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        r = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"({damp_num} * coalesce(s, CAST(0 AS BIGINT))) div {damp_den}")
            ).alias("r"),
        )
        if (it + 1) % ckpt_every == 0 and it + 1 < iters:
            r, new_ids = local_checkpoint_tracked(r)
            release_rdds(spark, r_ids)
            r_ids = new_ids
    return r.select("node", F.col("r").alias("rank_scaled"))
