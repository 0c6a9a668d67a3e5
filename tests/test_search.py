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


def _score_ref(T, N, max_dl, dl, tf, df, k1_x10=12, b_x100=75):
    """Pure-Python mirror of the shift + score chain."""
    idf = _fx64_ref(2 * N + 2, 2 * df + 1)
    blc1 = (1000 * 100 * (k1_x10 + 10)).bit_length()
    blk3 = (k1_x10 * b_x100).bit_length()
    s = max(
        0,
        T.bit_length() + max_dl.bit_length() + blc1 + 12 - 63,
        max_dl.bit_length() + N.bit_length() + blk3 + 6 - 63,
    )
    ts, dlns = T >> s, (dl * N) >> s
    k2, k3 = k1_x10 * (100 - b_x100), k1_x10 * b_x100
    num = 1000 * idf * (100 * (k1_x10 + 10)) * ts * tf
    den = 64 * (1000 * ts * tf + k2 * ts + k3 * dlns)
    return s, num // den


def _shifted_score_frame(spark, row):
    df = spark.createDataFrame(
        [row], "dl long, tf long, df long, n_docs long, t_tokens long, max_dl long"
    )
    df = search.with_fixed_log2_x64(df, "2 * n_docs + 2", "2 * df + 1", "idf_x64")
    for name, tmpl, _ in search._shift_chain(12, 75):
        df = df.withColumn(name, F.expr(tmpl))
    return df.withColumn("score_x1000", F.expr(search._score_templates(12, 75)[0]))


def test_bm25_overflow_shift_past_boundary(spark):
    """Past the pre-mitigation ~5e9-token int64 boundary: the shifted
    chain scores inside int64 where the unshifted formula overflows
    (loudly, under ANSI), and the value matches the Python mirror and
    the DuckDB rendering of the same spec."""
    import duckdb
    import pytest

    dl, tf, df_, N, T, max_dl = 200, 3, 1, 60_000_000, 6_000_000_000, 500
    frame = _shifted_score_frame(spark, (dl, tf, df_, N, T, max_dl))
    old_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        got = frame.first()
        exp_s, exp_score = _score_ref(T, N, max_dl, dl, tf, df_)
        assert got.bm_s == exp_s and exp_s > 0
        assert got.score_x1000 == exp_score
        unshifted = frame.withColumn(
            "boom",
            F.expr(
                "(1000 * idf_x64 * (100 * (12 + 10)) * t_tokens * tf) div "
                "(64 * (1000 * t_tokens * tf + 300 * t_tokens + 900 * dl * n_docs))"
            ),
        )
        with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
            unshifted.first()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old_ansi)

    # DuckDB renders the same chain to the same value
    fl = search.fixed_log2_sql_select(
        "2 * n_docs + 2", "2 * df + 1", "idf_x64",
        ["dl", "tf", "df", "n_docs", "t_tokens", "max_dl"],
        source="r",
    )
    shift = ", ".join(f"{d} AS {n}" for n, _, d in search._shift_chain(12, 75))
    duck = duckdb.sql(
        f"""WITH r AS (SELECT CAST({dl} AS BIGINT) AS dl, CAST({tf} AS BIGINT) AS tf,
                CAST({df_} AS BIGINT) AS df, CAST({N} AS BIGINT) AS n_docs,
                CAST({T} AS BIGINT) AS t_tokens, CAST({max_dl} AS BIGINT) AS max_dl),
            i AS ({fl})
            SELECT {shift}, {search._score_templates(12, 75)[1]} AS score FROM i"""
    ).fetchone()
    assert duck[-1] == exp_score


def test_bm25_shift_is_identity_below_boundary(spark):
    """s == 0 on a small corpus: the shifted score is bit-identical to
    the historical unshifted formula (q44 hashes cannot move)."""
    dl, tf, df_, N, T, max_dl = 200, 3, 1, 100, 10_000, 500
    got = _shifted_score_frame(spark, (dl, tf, df_, N, T, max_dl)).withColumn(
        "old",
        F.expr(
            "(1000 * idf_x64 * (100 * (12 + 10)) * t_tokens * tf) div "
            "(64 * (1000 * t_tokens * tf + 300 * t_tokens + 900 * dl * n_docs))"
        ),
    ).first()
    assert got.bm_s == 0 and got.score_x1000 == got.old
