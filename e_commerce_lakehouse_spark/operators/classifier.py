"""Hashed-ngram linear quality classifier (the fastText-style model
behind published LLM-corpus quality filters: GPT-3's WebText-vs-Common-
Crawl logistic filter, CCNet/RedPajama reproductions, Llama's wiki-ref
classifier). Heuristic rules (operators/text.py Gopher) catch garbage;
a trained classifier ranks the remainder — this module supplies the
train + score pair the pipeline needs, Spark-first.

Exactness discipline (the engine's usual trick, applied to SGD): every
quantity is Q16 fixed point, per-document gradient contributions are
INTEGERS, and integer sums are associative — so the distributed
full-batch gradient equals a single-node reference bit-for-bit, no
matter how Spark partitions, re-plans, or retries. The sigmoid is a
257-entry lookup table generated once at import (determinism comes
from both sides sharing THE LIST, the POW2_64TH_X20 pattern in
operators/sketches.py); feature hashing is md5-prefix mod dim
(hashlib and Spark's md5 agree by construction).

Scale shape: one tokenize+hash+count pass builds the sparse feature
frame (doc_id, idx, x_q) — the only corpus-sized artifact, built ONCE
and reused across iterations (checkpointed by the caller or via
``train``'s internal cut). Each iteration is: broadcast the dim-sized
weight table, one join + groupBy(doc) for margins (shuffles doc-sized
rows, never text), one groupBy(idx) for the gradient (dim rows out),
one dim-sized collect. Weights are dim·8 bytes of driver state —
4096-dim default is 32 KB; document the ceiling like
KMEANS_DRIVER_STATE_MAX rather than hit it (a 2^24-dim model is
128 MB: still fine to broadcast, raise ``dim`` consciously).

Training is iterative and engine-internal — pytest-gated against an
independent single-node reference (the BPE/unigram/PCA precedent), not
oracle-SQL-gated; scoring is pure relational and deterministic.
"""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parallelize import spread_for_cpu

Q = 16  # fixed-point fractional bits
ONE = 1 << Q

# sigma(x) for x = -8 .. 8 in steps of 1/16, Q16 — 257 entries. Both
# the Spark expression and the reference implementation index THIS
# list; the float exp only runs here, once, at import.
SIG_TABLE_X16 = [
    int(1.0 / (1.0 + math.exp(-(-8.0 + i / 16.0))) * ONE) for i in range(257)
]


def _hash_py(token: str, dim: int) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16) % dim


_HASH_SQL = (
    "CAST(conv(substring(md5({tok}), 1, 15), 16, 10) AS BIGINT) % {dim}"
)


# Java regex \s is ASCII-only ([ \t\n\x0B\f\r]); Python str.split()
# splits on ANY Unicode whitespace (U+00A0, U+2028, ...) — the reference
# side must use the SAME class as the Spark split or the bit-for-bit
# parity contract breaks on the first non-breaking space.
_WS = re.compile("[ \t\n\x0b\f\r]+")


def tokenize_py(text: str) -> list[str]:
    return [t for t in _WS.split((text or "").lower()) if t]


def hashed_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """Sparse hashed bag-of-ngrams: (doc_id, idx, x_q) with x_q =
    (count << 16) div total_ngrams — L1-normalized term frequency in
    exact Q16. Unigrams + joining-underscore bigrams (fastText's
    wordNgrams=2). One scan: tokens never leave the map side except as
    (doc, idx) count pairs. Empty/NULL docs produce no rows (score
    treats them as margin = bias = 0)."""
    # tokenize + gram explode + per-gram md5 hashing all run before
    # the first shuffle — keep an under-parallel scan from serializing
    # that map onto one core (spread is a structural no-op at scale)
    docs = spread_for_cpu(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda t: t != "",
        ).alias("_toks"),
    )
    grams = F.col("_toks")
    if bigrams:
        n = F.array_size("_toks")
        bi = F.zip_with(
            F.slice("_toks", 1, F.greatest(n - 1, F.lit(0))),
            F.slice("_toks", 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("_"), b),
        )
        grams = F.concat(grams, bi)
    exploded = toks.select("doc_id", F.explode(grams).alias("gram"))
    counted = (
        exploded.select(
            "doc_id", F.expr(_HASH_SQL.format(tok="gram", dim=int(dim))).alias("idx")
        )
        .groupBy("doc_id", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = counted.groupBy("doc_id").agg(F.sum("cnt").alias("total"))
    return counted.join(totals, "doc_id").select(
        "doc_id",
        "idx",
        F.expr(f"(cnt * {ONE}) div total").alias("x_q"),
    )


def _sigmoid_expr(margin_col: str) -> F.Column:
    """Q16 sigmoid lookup: index = clamp((m + 8·2^16) div 4096, 0, 256)
    — the 1/16-margin-step table above, rendered as an in-plan array
    literal (257 longs)."""
    tbl = F.array(*[F.lit(v).cast("long") for v in SIG_TABLE_X16])
    i = F.greatest(
        F.lit(0),
        F.least(F.lit(256), F.expr(f"({margin_col} + {8 * ONE}) div 4096")),
    )
    return F.element_at(tbl, i.cast("int") + 1)


# Deterministic synthetic weight spec (Knuth multiplicative constant):
# w(idx) = ((idx * 2654435761) % 4096) - 2048 — the ONE formula both
# the Spark expression and the DuckDB oracle render, so the q16
# 'ql_margin_q' column hash-gates the full scoring path (tokenize ->
# md5 hash -> Q16 tf -> dot product) without shipping a trained model
# into the oracle. Training itself is pytest-gated (see
# train_quality_classifier).
SPEC_WEIGHT_SQL = "(((idx * 2654435761) % 4096) - 2048)"


def spec_margins(features: DataFrame) -> DataFrame:
    """(doc_id, ql_margin_q) under the synthetic weight spec — the
    oracle-gated scoring surface. Same arithmetic as :func:`margins`
    with the weight computed in-plan from the feature index (no
    broadcast table at all)."""
    return features.groupBy("doc_id").agg(
        F.sum(F.expr(f"({SPEC_WEIGHT_SQL} * x_q) div {ONE}")).alias(
            "ql_margin_q"
        )
    )


def _check_weight_dim(weights, dim: int) -> None:
    """A weights list shorter than the feature dim would INNER-JOIN
    away every idx >= len(weights) in :func:`margins` — silently wrong
    scores. Fail loudly on the mismatch (a model trained at a
    different dim)."""
    if len(weights) != dim:
        raise ValueError(
            f"weights has {len(weights)} entries but dim={dim}; "
            "score with the dim the model was trained at"
        )


def margins(features: DataFrame, weights: list[int]) -> DataFrame:
    """(doc_id, margin_q): m = Σ_j w_j·x_j >> 16, exact int64. The
    dim-sized weight table broadcasts; the only shuffle is the per-doc
    sum."""
    spark = features.sparkSession
    w = weight_table(spark, weights)
    return (
        features.join(F.broadcast(w), "idx")
        .groupBy("doc_id")
        .agg(F.sum(F.expr(f"(w * x_q) div {ONE}")).alias("margin_q"))
    )


def train_quality_classifier(
    features: DataFrame,
    labels: DataFrame,
    dim: int = 4096,
    iters: int = 8,
    lr: tuple[int, int] = (4, 1),
) -> list[int]:
    """Full-batch gradient descent on logistic loss, ``iters`` rounds,
    all-integer: per round every doc's margin and table-sigmoid are
    computed distributed, the per-feature gradient sums (Q16 ints)
    come back as ``dim`` rows, and the driver applies
    ``w_j -= (lr_num · G_j) div (lr_den · n)`` exactly. Deterministic
    and partitioning-independent by construction — pytest pins
    equality with an independent single-node reference.

    ``labels``: (doc_id, label) with label in {0, 1}. Docs without
    features (empty text) still train: their margin is 0 and they pull
    only the bias-free weights they touch (none), matching the
    reference. Returns the Q16 weight list (len ``dim``)."""
    feats = features
    lab = labels.select("doc_id", F.col("label").cast("long").alias("y"))
    n = lab.count()
    if n == 0:
        raise ValueError("train_quality_classifier: no labeled docs")
    lr_num, lr_den = int(lr[0]), int(lr[1])
    weights = [0] * dim
    for _ in range(iters):
        m = margins(feats, weights)
        err = (
            lab.join(m, "doc_id", "left")
            .select(
                "doc_id",
                (
                    _sigmoid_expr("coalesce(margin_q, 0)")
                    - (F.col("y") * ONE)
                ).alias("e_q"),
            )
        )
        grad = (
            feats.join(err, "doc_id")
            .groupBy("idx")
            .agg(F.sum(F.expr(f"(e_q * x_q) div {ONE}")).alias("g"))
            .collect()
        )
        for r in grad:
            j = int(r.idx)
            weights[j] -= (lr_num * int(r.g)) // (lr_den * n)
    return weights


def score_documents(
    docs: DataFrame,
    weights: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """(doc_id, margin_q, prob_x16, keep): the trained filter applied
    corpus-wide — probability from the shared sigmoid table, ``keep``
    = prob >= 1/2. Pure relational (hash, join, groupBy); a docs row
    with empty text scores margin 0 / prob 0.5."""
    _check_weight_dim(weights, dim)
    if docs.isStreaming:
        # the relational path's per-doc groupBy is a streaming
        # aggregation (append mode unsupported without a watermark);
        # the Arrow kernel computes the identical margin as a pure
        # row map — batch == stream pinned in tests
        m = _margins_stream(docs, weights, text_col, id_col, dim, bigrams)
        return m.select(
            "doc_id",
            F.coalesce("margin_q", F.lit(0)).alias("margin_q"),
            _sigmoid_expr("coalesce(margin_q, 0)").alias("prob_x16"),
            (_sigmoid_expr("coalesce(margin_q, 0)") >= ONE // 2).alias("keep"),
        )
    feats = hashed_features(docs, text_col, id_col, dim, bigrams)
    m = margins(feats, weights)
    base = docs.select(F.col(id_col).alias("doc_id")).join(m, "doc_id", "left")
    return base.select(
        "doc_id",
        F.coalesce("margin_q", F.lit(0)).alias("margin_q"),
        _sigmoid_expr("coalesce(margin_q, 0)").alias("prob_x16"),
        (_sigmoid_expr("coalesce(margin_q, 0)") >= ONE // 2).alias("keep"),
    )


def weight_table(spark, weights: list[int]) -> DataFrame:
    """The persistable (idx, w) artifact of
    :func:`train_quality_classifier` — dim rows, the merge-table
    pattern (operators/bpe.py:228)."""
    return spark.createDataFrame(
        list(enumerate(int(x) for x in weights)), "idx long, w long"
    )


def save_weights(spark, weights: list[int], path: str) -> None:
    weight_table(spark, weights).coalesce(1).write.mode("overwrite").parquet(
        path
    )


def load_weights(spark, path: str, dim: int | None = None) -> list[int]:
    """Weights back as the dense list scoring expects.
    :func:`save_weights` artifacts are DENSE (one row per index), so
    the inferred dim (max idx + 1) is exact for them; for an
    externally-produced sparse table pass ``dim`` explicitly — missing
    indexes load as 0 (the untrained prior) and an unpadded sparse
    load would fail scoring's dim check."""
    rows = spark.read.parquet(path).collect()
    if not rows and dim is None:
        raise ValueError(f"empty weight table at {path}; pass dim to pad")
    n = dim if dim is not None else max(int(r.idx) for r in rows) + 1
    out = [0] * n
    for r in rows:
        out[int(r.idx)] = int(r.w)
    return out


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — Spark's ``div`` (and
    DuckDB's ``//``); Python's ``//`` floors, which differs on
    negative numerators (weights go negative)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _margin_py(
    text: str | None,
    weights: list[int],
    dim: int,
    bigrams: bool,
    idx_memo: dict,
) -> int | None:
    """One document's Q16 margin, pure Python — the SINGLE source of
    truth for every Arrow kernel (streaming scoring here, the fused
    streaming curation gate): same tokenizer, md5 hash, Q16 tf
    quantization and truncating division as the relational path, so
    batch == stream stays pinned by construction rather than by two
    hand-synchronized copies. ``idx_memo`` caches gram->index across a
    batch. Returns None for empty/NULL text (no features)."""
    toks = tokenize_py(text)
    grams = list(toks)
    if bigrams:
        grams += [a + "_" + b for a, b in zip(toks, toks[1:])]
    counts: dict[int, int] = {}
    for g in grams:
        idx = idx_memo.get(g)
        if idx is None:
            idx = idx_memo[g] = _hash_py(g, dim)
        counts[idx] = counts.get(idx, 0) + 1
    total = sum(counts.values())
    if not total:
        return None
    m = 0
    for idx, cnt in counts.items():
        x_q = _tdiv(cnt * ONE, total)
        m += _tdiv(weights[idx] * x_q, ONE)
    return m


def _margins_stream(
    docs: DataFrame,
    weights: list[int],
    text_col: str,
    id_col: str,
    dim: int,
    bigrams: bool,
) -> DataFrame:
    """Streaming-safe margins: ONE Arrow kernel computes tokenize ->
    md5-hash -> Q16 tf -> dot product per document (weights in the
    closure) — a pure row map, no shuffle, so it runs under append
    mode with no watermark. Arithmetic mirrors the relational path
    EXACTLY: same hash (hashlib == Spark md5 by construction), same
    Q16 quantization, same truncating division (the batch==stream
    equality is pytest-pinned)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    # carry the id column's ACTUAL dtype: the batch path joins on any
    # id type, so the stream path must not hardcode long
    id_type = docs.schema[id_col].dataType
    schema = StructType(
        [StructField("doc_id", id_type), StructField("margin_q", LongType())]
    )

    def run(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            rows = [
                (doc_id, _margin_py(text, weights, dim, bigrams, memo))
                for doc_id, text in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "margin_q"])

    return docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(run, schema)
