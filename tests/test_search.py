"""BM25 retrieval + inverted index (operators/search.py): fixed-point
log2 exactness against an independent Python reference, ranking
semantics on a planted corpus, and postings correctness."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import search


def _fx64_ref(p: int, q: int) -> int:
    """Independent pure-Python reference of the fixed-point chain."""
    m = (p // q).bit_length() - 1
    x = (p << 20) // (q << m)
    frac = 0
    for _ in range(6):
        x = (x * x) >> 20
        bit = 1 if x >= (1 << 21) else 0
        if bit:
            x >>= 1
        frac = (frac << 1) | bit
    return m * 64 + frac


def test_fixed_log2_matches_reference_and_true_log(spark):
    cases = [(p, q) for p in (1, 2, 3, 7, 10, 1002, 99991, 10**7 + 1)
             for q in (1, 2, 5, 761) if p >= q]
    df = spark.createDataFrame(cases, "p long, q long")
    out = {
        (r.p, r.q): r.v
        for r in search.with_fixed_log2_x64(df, "p", "q", "v").collect()
    }
    for p, q in cases:
        got = out[(p, q)]
        assert got == _fx64_ref(p, q), (p, q)
        # deterministic truncation: within one 1/64-bit step + the Q20
        # mantissa round-off of the true value, never above it by > 1
        assert abs(got - math.floor(64 * math.log2(p / q))) <= 1, (p, q, got)


def test_bm25_ranking_semantics(spark):
    # 4 docs: 'rare' appears only in doc 1; 'common' everywhere.
    docs = spark.createDataFrame(
        [
            (1, "rare common common"),
            (2, "common common common common"),
            (3, "common filler filler filler filler filler"),
            (4, "filler filler"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in search.bm25_topk(docs, ("rare", "common"), k=3).collect()}
    # doc 4 matches nothing -> absent; k bound respected
    assert set(rows) == {1, 2, 3}
    # the rare-term doc wins despite fewer 'common' occurrences
    assert rows[1].rank == 1 and rows[1].n_terms == 2
    # among common-only docs, higher tf and shorter length ranks first
    assert rows[2].score_x1000 > rows[3].score_x1000
    # saturation: doc2 (tf=4) must not score 4x doc3 (tf=1) on 'common'
    assert rows[2].score_x1000 < 4 * rows[3].score_x1000
    # ranks are dense over the returned frame
    assert sorted(r.rank for r in rows.values()) == [1, 2, 3]


def test_bm25_tie_break_and_k(spark):
    docs = spark.createDataFrame(
        [(i, "t x") for i in range(10, 0, -1)], "doc_id long, text string"
    )
    top = search.bm25_topk(docs, ("t",), k=4).collect()
    # identical docs: deterministic doc_id tie-break, k rows
    assert [r.doc_id for r in top] == [1, 2, 3, 4]
    assert [r.rank for r in top] == [1, 2, 3, 4]
    assert len({r.score_x1000 for r in top}) == 1


def test_postings(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        (r.term, r.doc_id): r.tf for r in search.build_postings(docs).collect()
    }
    assert got == {("a", 1): 2, ("b", 1): 1, ("b", 2): 1, ("c", 2): 1}


def test_bm25_no_python_udf(spark):
    """The whole BM25 plan stays JVM-side: no Python eval nodes."""
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = search.bm25_topk(docs, ("a",), k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
