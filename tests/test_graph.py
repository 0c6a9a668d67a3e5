"""Clickstream graph + integer PageRank invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import graph
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_click_edges_simple_directed(spark):
    edges = graph.click_edges(load_table(spark, SF_SMALL, "events"))
    rows = edges.collect()
    assert rows, "event log should yield transition edges"
    assert len(rows) == len({(r.src, r.dst) for r in rows}), "edges must be distinct"
    assert all(r.src != r.dst for r in rows), "no self-loops"


def test_pagerank_invariants_and_determinism(spark):
    events = load_table(spark, SF_SMALL, "events")
    edges = graph.click_edges(events)
    pr = graph.pagerank(edges, iters=2)
    rows = pr.collect()
    n = len(rows)
    scale = graph.RANK_SCALE
    teleport = (15 * scale) // (100 * n)
    assert all(r.rank_scaled >= teleport for r in rows), "teleport floor violated"
    # dangling mass is dropped, floors only shrink: total never exceeds scale
    total = sum(r.rank_scaled for r in rows)
    assert total <= scale
    assert total >= scale // 2, "lost more than half the mass — wiring bug"
    # bit-identical on rerun (integer math, no shuffle-order dependence)
    again = {r.node: r.rank_scaled for r in graph.pagerank(edges, iters=2).collect()}
    assert {r.node: r.rank_scaled for r in rows} == again


def test_pagerank_long_run_matches_python_model(spark):
    """9 iterations crosses the periodic lineage cut (every 8 rounds) —
    the checkpointed tail must produce EXACTLY the values of the pure
    integer recurrence, computed here by a driver-side model on an
    explicit graph (node 4 is dangling: its mass drops; node 1 has an
    extra in-edge)."""
    edge_list = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4)]
    iters, scale, num, den = 9, graph.RANK_SCALE, 85, 100

    nodes = sorted({v for e in edge_list for v in e})
    out = {u: sum(1 for s, _ in edge_list if s == u) for u in nodes}
    teleport = ((den - num) * scale) // (den * len(nodes))
    r = {v: scale // len(nodes) for v in nodes}
    for _ in range(iters):
        share = {u: r[u] // out[u] for u in nodes if out.get(u)}
        incoming = {
            v: sum(share[s] for s, d in edge_list if d == v and s in share)
            for v in nodes
        }
        r = {v: teleport + (num * incoming[v]) // den for v in nodes}

    got = {
        row.node: row.rank_scaled
        for row in graph.pagerank(
            spark.createDataFrame(edge_list, ["src", "dst"]), iters=iters
        ).collect()
    }
    assert got == r


def _brute_triangles(edge_list):
    """Driver-side reference: count triangles by closed-neighborhood
    intersection over the undirected simple graph."""
    adj: dict[int, set[int]] = {}
    for s, d in edge_list:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    per_node = {v: 0 for v in adj}
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for v in (a, b, c):
                        per_node[v] += 1
    return per_node


def test_triangle_counts_vs_bruteforce(spark):
    """Degree-ordered orientation vs a brute-force intersection count —
    includes a hub (node 0 connected to everything) to exercise the
    skew path, a clique, a triangle-free star arm, and reverse/dup/self
    edges that the canonicalization must absorb."""
    edge_list = (
        # K4 clique on 1..4
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        # hub 0 touches 1..8
        + [(0, i) for i in range(1, 9)]
        # path arm (triangle-free beyond the hub wedges)
        + [(8, 9), (9, 10)]
        # noise: duplicates, reversed duplicates, a self loop
        + [(2, 1), (1, 2), (7, 7), (0, 3)]
    )
    expect = _brute_triangles(edge_list)
    got = {
        r.node: r.tri_count
        for r in graph.triangle_counts(
            spark.createDataFrame(edge_list, ["src", "dst"])
        ).collect()
    }
    assert got == expect
    # zeros are reported, not dropped
    assert got[10] == 0


def test_triangle_counts_on_click_graph(spark):
    """On the real click graph: total triangle mass is divisible by 3
    (each triangle contributes to exactly 3 corners) and every node of
    the undirected graph appears exactly once."""
    edges = graph.click_edges(load_table(spark, SF_SMALL, "events"))
    tc = graph.triangle_counts(edges).collect()
    und = graph.undirect(edges)
    n_nodes = (
        und.select(F.col("lo").alias("n")).union(und.select("hi")).distinct().count()
    )
    assert len(tc) == n_nodes
    assert sum(r.tri_count for r in tc) % 3 == 0
