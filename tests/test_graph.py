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
