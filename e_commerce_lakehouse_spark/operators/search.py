"""Keyword retrieval over the document corpus: inverted-index postings
and BM25 top-k ranking (engine extension beyond the reference —
BASELINE.json north star; the reference's query surface has no text
retrieval, but a training-data/RAG pipeline needs one).

BM25 (Robertson et al., Okapi; the idf takes Lucene's ``log(1 + (N - df
+ 0.5)/(df + 0.5))`` form, which is non-negative by construction) with
every quantity EXACT-INTEGER so the DuckDB oracle hashes it
value-identical:

- the log2 in the idf is computed in FIXED POINT over integers — the
  integer part is ``floor(log2(p div q)) = bit_length(p div q) - 1``
  (exact: for q ≤ p, p/q and p div q always share a binary magnitude),
  and 6 fractional bits come from the classical shift-and-square
  recurrence on a Q20 fixed-point mantissa (square, renormalize, emit
  one bit — each step exact in int64). No float ``log`` whose last ulp
  could differ between engines ever runs; the same chain is rendered
  for Spark (``bin``/``div``/``shiftleft``) and DuckDB
  (``format('{:b}')``/``//``/``<<``) from ONE spec below, so the two
  sides cannot drift.
- the tf saturation is cleared to a single integer rational:
  with k1 = k1_x10/10 and b = b_x100/100,

    idf * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

  over avgdl = T/N becomes (multiply num and den by 1000·T)

    score_x1000 = (1000 · idf_x64 · 100·(k1_x10+10) · T · tf)
              div (64 · (1000·T·tf + k1_x10·(100−b_x100)·T
                         + k1_x10·b_x100·dl·N)).

  int64 headroom: the numerator is 2.2e6 · idf_x64 · T · tf, so it
  overflows at T·tf ≈ 4.2e12 / idf_x64 — for a rare term
  (idf_x64 ≈ 640 at N/df ≈ 1000) that is T·tf ≈ 6.5e9, i.e. a
  ~5e9-token corpus already needs mitigation. Beyond that, shift T
  and dl·N right by the same power of two before scoring (the ratio,
  hence the ranking, is preserved to the shifted precision) — under
  Spark's default ANSI mode the overflow raises rather than
  corrupting rankings, so the boundary is loud.

Scale shape: the query-term list is tiny and rides into the row-level
tf computation as an array literal (no join, no explode of the corpus
— per-doc work is O(|terms|·dl) inside codegen); only docs matching
≥ 1 term leave the scan, so the df window and the per-doc sum shuffle
a candidate frame ~|terms|·|matching docs| rows, not the corpus. The
corpus-stats pass (N, T) is a separate count/sum-only scan — at 100 TB
those two numbers are corpus constants a deployment caches (cf.
corpus_cache), not per-query work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

# ---------------------------------------------------------------------------
# Fixed-point log2: one chain spec, two renderers. Each step is
# (name, spark_template, duck_template); templates reference prior
# step names. Q20 mantissa, 6 fractional bits.
# ---------------------------------------------------------------------------

_FL_PREFIX_STEPS = [
    # integer part: bit_length(p div q) - 1 == floor(log2(p/q)) for p >= q
    ("fl_m", "length(bin(({p}) div ({q}))) - 1",
     "length(format('{{:b}}', ({p}) // ({q}))) - 1"),
    # Q20 mantissa of (p/q) / 2^m, in [2^20, 2^21)
    ("fl_x0", "(({p}) * 1048576L) div (({q}) * shiftleft(1L, fl_m))",
     "(({p}) * CAST(1048576 AS BIGINT)) // (({q}) * (CAST(1 AS BIGINT) << fl_m))"),
]


def _fl_round_steps(i: int) -> list[tuple[str, str, str]]:
    prev = f"fl_x{i - 1}"
    return [
        (f"fl_y{i}", f"shiftright({prev} * {prev}, 20)", f"({prev} * {prev}) >> 20"),
        (f"fl_b{i}", f"CASE WHEN fl_y{i} >= 2097152 THEN 1 ELSE 0 END",
         f"CASE WHEN fl_y{i} >= 2097152 THEN 1 ELSE 0 END"),
        (f"fl_x{i}", f"shiftright(fl_y{i}, fl_b{i})", f"fl_y{i} >> fl_b{i}"),
    ]


_FL_FINAL = (
    "fl_out",
    "fl_m * 64 + fl_b1*32 + fl_b2*16 + fl_b3*8 + fl_b4*4 + fl_b5*2 + fl_b6",
    "fl_m * 64 + fl_b1*32 + fl_b2*16 + fl_b3*8 + fl_b4*4 + fl_b5*2 + fl_b6",
)


def _fl_chain(p: str, q: str) -> list[tuple[str, str, str]]:
    steps = [
        (n, s.format(p=p, q=q), d.format(p=p, q=q)) for n, s, d in _FL_PREFIX_STEPS
    ]
    for i in range(1, 7):
        steps.extend(_fl_round_steps(i))
    steps.append(_FL_FINAL)
    return steps


def with_fixed_log2_x64(df: DataFrame, p: str, q: str, out: str) -> DataFrame:
    """Add column ``out`` = floor-ish fixed-point ``64·log2(p/q)`` (exact
    integer part + 6 deterministic fractional bits) for positive integer
    expressions ``p >= q >= 1``. Intermediates are dropped."""
    names = []
    for name, spark_tmpl, _ in _fl_chain(p, q):
        df = df.withColumn(name, F.expr(spark_tmpl))
        names.append(name)
    return df.withColumn(out, F.col("fl_out")).drop(*names)


def fixed_log2_sql_select(p: str, q: str, out: str, carry: list[str]) -> str:
    """DuckDB SELECT list computing the SAME chain via lateral column
    references, carrying ``carry`` columns through; generated from the
    one chain spec so the oracle cannot drift from the Spark side."""
    cols = ", ".join(carry)
    steps = ", ".join(
        f"{duck_tmpl} AS {name}" for name, _, duck_tmpl in _fl_chain(p, q)
    )
    return f"SELECT {cols}, {steps}, fl_out AS {out}"


# ---------------------------------------------------------------------------
# Inverted index
# ---------------------------------------------------------------------------


def build_postings(documents: DataFrame) -> DataFrame:
    """Inverted-index postings: one row per (term, doc_id) with the
    term frequency. One explode + one partially-aggregated groupBy —
    a single shuffle keyed by (term, doc_id), which stays uniform even
    when a term is hot (the doc_id component spreads it). Downstream
    consumers wanting per-term lists should keep it relational (joins
    against this frame), not collect_list — a stopword's posting list
    at 100 TB does not fit in one task."""
    return (
        documents.select(
            "doc_id", F.explode(tokens("text")).alias("term")
        )
        .filter(F.length("term") > 0)  # split artifacts index nothing
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


# ---------------------------------------------------------------------------
# BM25 top-k
# ---------------------------------------------------------------------------


def bm25_topk(
    documents: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    k1_x10: int = 12,
    b_x100: int = 75,
) -> DataFrame:
    """Rank documents against ``query_terms`` by exact-integer BM25
    (module docstring: fixed-point log2 idf, rational-cleared tf
    saturation; defaults k1=1.2, b=0.75). Returns the global top ``k``
    as (doc_id, n_terms, score_x1000, rank), ties broken by doc_id.

    Plan: tf per query term is computed inside the corpus scan as an
    array transform over a literal (no corpus explode/join); only
    matching (doc, term) rows survive, df comes from one window over
    that compact candidate frame, the per-doc sum is the second compact
    shuffle, and the top-k is TakeOrderedAndProject."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens("text")
    terms_arr = F.array(*[F.lit(t) for t in query_terms])
    pairs = F.transform(
        terms_arr,
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(toks, lambda x: x == t)).alias("tf"),
        ),
    )
    cand = (
        documents.select(
            "doc_id", F.size(toks).alias("dl"), F.explode(pairs).alias("p")
        )
        .select("doc_id", "dl", "p.term", "p.tf")
        .filter(F.col("tf") > 0)
    )
    stats = documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("t_tokens"),
    )
    cand = cand.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).crossJoin(F.broadcast(stats))
    # Lucene-form idf argument: 1 + (N - df + 0.5)/(df + 0.5)
    #                         = (2N + 2) / (2 df + 1)
    cand = with_fixed_log2_x64(cand, "2 * n_docs + 2", "2 * df + 1", "idf_x64")
    scored = cand.withColumn(
        "score_x1000",
        F.expr(
            f"(1000 * idf_x64 * (100 * ({k1_x10} + 10)) * t_tokens * tf) div "
            f"(64 * (1000 * t_tokens * tf + ({k1_x10} * (100 - {b_x100})) * t_tokens "
            f"+ ({k1_x10} * {b_x100}) * dl * n_docs))"
        ),
    )
    top = (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("score_x1000").alias("score_x1000"),
        )
        .orderBy(F.desc("score_x1000"), "doc_id")
        .limit(k)
    )
    # rank over the k-row result (post-limit; single tiny partition)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("score_x1000"), "doc_id")),
    )


def bm25_oracle_sql(
    query_terms: tuple[str, ...],
    k: int = 10,
    k1_x10: int = 12,
    b_x100: int = 75,
) -> str:
    """DuckDB mirror of :func:`bm25_topk`, with the fixed-point-log2
    SELECT generated from the same chain spec the Spark side renders —
    the idf arithmetic cannot drift between engines."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    fl = fixed_log2_sql_select(
        "2 * n_docs + 2",
        "2 * df + 1",
        "idf_x64",
        ["doc_id", "dl", "term", "tf", "df", "n_docs", "t_tokens"],
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), cand AS (
            SELECT doc_id, len(toks) AS dl, term,
                   len(list_filter(toks, x -> x = term)) AS tf
            FROM toks, (SELECT unnest([{terms}]) AS term)
            WHERE len(list_filter(toks, x -> x = term)) > 0
        ), stats AS (
            SELECT count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_tokens
            FROM documents
        ), withdf AS (
            SELECT c.*, count(*) OVER (PARTITION BY term) AS df,
                   s.n_docs, s.t_tokens
            FROM cand c, stats s
        ), idf AS (
            {fl}
            FROM withdf
        ), scored AS (
            SELECT doc_id,
                   (1000 * idf_x64 * (100 * ({k1_x10} + 10)) * t_tokens * tf) //
                   (64 * (1000 * t_tokens * tf
                          + ({k1_x10} * (100 - {b_x100})) * t_tokens
                          + ({k1_x10} * {b_x100}) * dl * n_docs)) AS score_x1000
            FROM idf
        ), agg AS (
            SELECT doc_id, count(*) AS n_terms,
                   CAST(sum(score_x1000) AS BIGINT) AS score_x1000
            FROM scored GROUP BY doc_id
            ORDER BY score_x1000 DESC, doc_id LIMIT {k}
        )
        SELECT doc_id, n_terms, score_x1000,
               CAST(row_number() OVER (ORDER BY score_x1000 DESC, doc_id)
                    AS BIGINT) AS rank
        FROM agg
    """
