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

  int64 headroom: the numerator is 2.2e6 · idf_x64 · T · tf, which
  would overflow at T·tf ≈ 4.2e12 / idf_x64 — a ~5e9-token corpus for
  a rare term. MITIGATION (applied in-plan, same spec both dialects):
  a global shift s is derived from bit_length bounds —

    s = max(0, bl(T) + bl(max_dl) + bl(c1) + 12 − 63,
               bl(max_dl) + bl(N) + bl(k1·b) + 6 − 63)

  (12 = the universal idf_x64 bound: fl_out ≤ 64·63 + 63 < 2^12 for
  any int64 input) and T and dl·N are right-shifted by s before
  scoring. Both numerator and denominator scale by ~2^−s, so the
  ratio — hence the ranking — is preserved to the shifted precision
  (relative error ≤ 2^−bl(T>>s)); s = 0 on any corpus under the old
  boundary, so small-scale scores are bit-identical to the unshifted
  form. s is computed from the stats row INSIDE the plan (no extra
  action), and the oracle renders the same chain. Remaining documented
  boundaries: dl·N must fit int64 pre-shift (bl(max_dl) + bl(N) ≤ 63 —
  at 1e11 docs × 1e5 tokens that is 2^53, far inside), and a single
  document beyond ~2^29 tokens would shift T to zero.

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


def fixed_log2_sql_select(
    p: str, q: str, out: str, carry: list[str], source: str
) -> str:
    """Complete DuckDB SELECT computing the SAME chain over ``source``
    (a CTE name or parenthesized subquery), carrying ``carry`` columns
    through; generated from the one chain spec so the oracle cannot
    drift from the Spark side.

    Each chain step sits in its OWN nested subquery level. The first
    form emitted all steps as lateral column references in ONE flat
    SELECT — DuckDB inlines every lateral reference, so the expression
    tree grew EXPONENTIALLY in chain depth: compiling one ~20-step
    chain transiently spiked tens of thousands of allocator mappings,
    tripped vm.max_map_count (65530), and every later allocation in
    the process failed with bad_alloc despite free RAM — the q33/q34
    oracle OOM cascade. Nested levels reference each step once; the
    tree is linear and the compile is cheap."""
    cols = ", ".join(carry)
    sql = f"SELECT {cols}, ({p}) AS _flp, ({q}) AS _flq FROM {source}"
    for name, _spark_tmpl, duck_tmpl in _fl_chain("_flp", "_flq"):
        sql = f"SELECT *, {duck_tmpl} AS {name} FROM ({sql})"
    return f"SELECT {cols}, fl_out AS {out} FROM ({sql})"


# ---------------------------------------------------------------------------
# Overflow-shift + score: one chain spec, two renderers (same discipline
# as the fixed-point log2 above). Expects columns t_tokens, max_dl,
# n_docs, dl, tf, idf_x64 in scope.
# ---------------------------------------------------------------------------


def _bitlen(expr: str, duck: bool) -> str:
    return (
        f"length(format('{{:b}}', {expr}))" if duck else f"length(bin({expr}))"
    )


def _shift_chain(k1_x10: int, b_x100: int) -> list[tuple[str, str, str]]:
    """(name, spark, duck) steps computing the global headroom shift
    ``bm_s`` and the shifted corpus quantities ``bm_ts`` (T >> s) and
    ``bm_dlns`` ((dl·N) >> s). See the module docstring for the bound
    derivation; 12 is the universal idf_x64 bit bound."""
    blc1 = (1000 * 100 * (k1_x10 + 10)).bit_length()
    blk3 = (k1_x10 * b_x100).bit_length()

    def s_expr(duck: bool) -> str:
        return (
            f"greatest(0, {_bitlen('t_tokens', duck)} + {_bitlen('max_dl', duck)}"
            f" + {blc1 + 12} - 63, {_bitlen('max_dl', duck)}"
            f" + {_bitlen('n_docs', duck)} + {blk3 + 6} - 63)"
        )

    return [
        ("bm_s", s_expr(False), s_expr(True)),
        ("bm_ts", "shiftright(t_tokens, bm_s)", "t_tokens >> bm_s"),
        ("bm_dlns", "shiftright(dl * n_docs, bm_s)", "(dl * n_docs) >> bm_s"),
    ]


def _score_templates(k1_x10: int, b_x100: int) -> tuple[str, str]:
    """(spark, duck) templates for score_x1000 over the shifted
    quantities — identical arithmetic, only the integer-division
    operator differs."""
    k2 = k1_x10 * (100 - b_x100)
    k3 = k1_x10 * b_x100
    # idf_x64 is INT (it comes off length(bin(...)) arithmetic) — the
    # leading literal must be long or the constant-first product
    # overflows int32 long before the int64 headroom analysis applies.
    def num(one_thousand_long: str) -> str:
        return f"{one_thousand_long} * idf_x64 * (100 * ({k1_x10} + 10)) * bm_ts * tf"

    den = f"64 * (1000 * bm_ts * tf + {k2} * bm_ts + {k3} * bm_dlns)"
    return (
        f"({num('1000L')}) div ({den})",
        f"({num('CAST(1000 AS BIGINT)')}) // ({den})",
    )


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
        F.max(F.size(toks)).alias("max_dl"),
    )
    cand = cand.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).crossJoin(F.broadcast(stats))
    # Lucene-form idf argument: 1 + (N - df + 0.5)/(df + 0.5)
    #                         = (2N + 2) / (2 df + 1)
    cand = with_fixed_log2_x64(cand, "2 * n_docs + 2", "2 * df + 1", "idf_x64")
    shift_names = []
    for name, spark_tmpl, _ in _shift_chain(k1_x10, b_x100):
        cand = cand.withColumn(name, F.expr(spark_tmpl))
        shift_names.append(name)
    scored = cand.withColumn(
        "score_x1000", F.expr(_score_templates(k1_x10, b_x100)[0])
    ).drop(*shift_names)
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
        ["doc_id", "dl", "term", "tf", "df", "n_docs", "t_tokens", "max_dl"],
        source="withdf",
    )
    shift = ", ".join(
        f"{duck} AS {name}" for name, _, duck in _shift_chain(k1_x10, b_x100)
    )
    duck_score = _score_templates(k1_x10, b_x100)[1]
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
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_tokens,
                   CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_dl
            FROM documents
        ), withdf AS (
            SELECT c.*, count(*) OVER (PARTITION BY term) AS df,
                   s.n_docs, s.t_tokens, s.max_dl
            FROM cand c, stats s
        ), idf AS (
            {fl}
        ), scored AS (
            SELECT doc_id, {shift},
                   {duck_score} AS score_x1000
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
