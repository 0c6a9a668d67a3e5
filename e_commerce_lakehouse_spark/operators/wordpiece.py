"""Distributed WordPiece tokenizer training + encoding (engine
extension — completes the tokenizer-training family next to
operators/bpe.py (Sennrich BPE) and operators/unigram.py (Kudo
unigram-LM); the reference repo has no tokenizer surface at all).

WordPiece per Schuster & Nakajima 2012 / the BERT tokenizer, with the
Hugging Face ``tokenizers`` trainer semantics: like BPE, but

- word-internal continuation symbols carry the ``##`` prefix and there
  is no end-of-word marker;
- each round merges the adjacent pair maximizing the likelihood score
  ``count(a,b) / (count(a) * count(b))`` — the pair whose merge most
  increases corpus likelihood under a unigram factorization — instead
  of the raw pair count;
- the merged symbol is ``a + strip_##(b)`` and inherits ``a``'s
  continuation status.

Spark restructuring mirrors bpe.py: the corpus collapses once to a
word-frequency vocab (the only corpus-wide shuffle); each round is one
job over the vocab — adjacent-pair counts and per-symbol counts
(both freq-weighted, partial-agg groupBys), a broadcast join of the
tiny symbol-count frame onto the pair frame, and a 1-row top-score
collect. The score spec is ``c / double(cnt_a * cnt_b)`` with the
product computed as the EXACT int64 (domain-guarded in-plan at 2^31
per count) and rounded ONCE by the double cast — deterministic,
partitioning-independent, and pinned equal to the single-node
reference (which computes the identical expression). The published
WordPiece scoring rule is a ratio, so unlike BPE's pure-count ordering
an all-integer scalar sort key does not exist — cross-multiplying
would need per-comparison arithmetic, not a column.

Encoding is the standard greedy longest-match-first against the final
token set (NOT merge ranks — WordPiece encoders only need the vocab),
Arrow-batched per word with a per-batch memo, same honest Python
boundary as bpe.bpe_encode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .parallelize import local_checkpoint_tracked, release_rdds
from .text import tokens

#: continuation prefix for word-internal symbols (BERT convention).
CONT = "##"
UNK = "[UNK]"


def _wp_symbols(word: Column) -> Column:
    """word -> [first char, ##second, ##third, ...]."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.when(i == 1, word.substr(i, F.lit(1))).otherwise(
            F.concat(F.lit(CONT), word.substr(i, F.lit(1)))
        ),
    )


def word_vocab(documents: DataFrame) -> DataFrame:
    """(word, freq, syms) word-frequency vocab with WordPiece initial
    symbols. One corpus shuffle, keyed by word (hot words combine
    map-side)."""
    return (
        documents.select(F.explode(tokens("text")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", _wp_symbols(F.col("word")))
    )


def _merged_symbol(a: str, b: str) -> str:
    return a + (b[len(CONT) :] if b.startswith(CONT) else b)


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every symbol array, merging adjacent (a, b) ->
    merged(a, b) left-to-right — same pure-Column fold as
    bpe._apply_merge (non-overlap automatic: a fresh merge leaves the
    merged symbol, which differs from ``a`` because ``b`` is never
    empty)."""
    merged = _merged_symbol(a, b)

    def step(arr: Column, s: Column) -> Column:
        can = (F.try_element_at(arr, F.lit(-1)) == a) & (s == b)
        return F.when(
            can,
            F.concat(F.slice(arr, F.lit(1), F.size(arr) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(arr, F.array(s)))

    return vocab.withColumn(
        "syms",
        F.aggregate("syms", F.array().cast("array<string>"), step),
    )


def _scored_pairs(vocab: DataFrame) -> DataFrame:
    """(a, b, c, score): adjacent-pair counts joined with per-symbol
    counts, scored c / (cnt_a * cnt_b). Both count frames are
    vocab-round aggregations; the symbol-count frame is alphabet+merges
    sized — broadcast onto the pair frame twice."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at("syms", i).alias("a"),
            F.element_at("syms", i + 1).alias("b"),
        ),
    )
    pair_counts = (
        vocab.filter(F.size("syms") >= 2)
        .select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("c"))
    )
    sym_counts = (
        vocab.select(F.col("freq"), F.explode("syms").alias("s"))
        .groupBy("s")
        .agg(F.sum("freq").alias("cnt"))
    )
    return (
        pair_counts.join(
            F.broadcast(sym_counts.withColumnRenamed("s", "a")), "a"
        )
        .withColumnRenamed("cnt", "cnt_a")
        .join(
            F.broadcast(
                sym_counts.withColumnRenamed("s", "b").withColumnRenamed(
                    "cnt", "cnt_b"
                )
            ),
            "b",
        )
        .select(
            "a",
            "b",
            "c",
            # denominator as the EXACT int64 product, cast once — the
            # single-node reference divides by the exact integer
            # product, and double(a)*double(b) would round TWICE,
            # diverging by ULPs (and flipping near-tie argmaxes) once
            # the product passes 2^53. Domain-guarded in-plan: counts
            # above 2^31 would overflow the int64 product.
            (
                F.col("c").cast("double")
                / F.when(
                    (F.col("cnt_a") > 1 << 31) | (F.col("cnt_b") > 1 << 31),
                    F.expr(
                        "CAST(raise_error('wordpiece: symbol counts must"
                        " be <= 2^31 (int64 score-denominator domain)')"
                        " AS BIGINT)"
                    ),
                )
                .otherwise(F.col("cnt_a") * F.col("cnt_b"))
                .cast("double")
            ).alias("score"),
        )
    )


def train_wordpiece(
    documents: DataFrame,
    num_merges: int = 20,
    min_count: int = 2,
) -> tuple[list[tuple[str, str]], list[str], DataFrame]:
    """Learn up to ``num_merges`` WordPiece merges; returns
    (merges in learned order, final token vocab list, final word-vocab
    frame). The token vocab is the sorted initial alphabet followed by
    one token per merge in learned order — exactly the artifact a
    greedy encoder needs. Stops early when no pair reaches
    ``min_count``. Tie-break (score desc, a asc, b asc) is a total
    order, so the sequence is partitioning-independent. One round = one
    job (the 1-row top collect materializes the pending lazy
    checkpoint); superseded checkpoints released after the next
    action, the bpe.py/duplicate_clusters discipline."""
    spark = documents.sparkSession
    vocab = word_vocab(documents)
    alphabet_rows = (
        vocab.select(F.explode("syms").alias("s")).distinct().collect()
    )
    token_vocab = sorted(r.s for r in alphabet_rows)
    merges: list[tuple[str, str]] = []
    ids_live: set[int] = set()
    ids_old: set[int] = set()
    while len(merges) < num_merges:
        top = (
            _scored_pairs(vocab)
            .filter(F.col("c") >= min_count)
            .orderBy(F.desc("score"), "a", "b")
            .limit(1)
            .collect()
        )
        release_rdds(spark, ids_old)
        ids_old = set()
        if not top:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        token_vocab.append(_merged_symbol(a, b))
        vocab, new_ids = local_checkpoint_tracked(
            _apply_merge(vocab, a, b), eager=False
        )
        ids_old, ids_live = ids_live, new_ids
    return merges, token_vocab, vocab


def encode_word(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-match-first WordPiece encoding of one word
    (the BERT ``WordpieceTokenizer`` algorithm): repeatedly take the
    longest prefix of the remainder present in ``vocab`` (with the
    ``##`` continuation prefix after the first piece); if no prefix
    matches, the WHOLE word becomes [UNK]."""
    pieces: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        piece = None
        while j > i:
            cand = word[i:j] if i == 0 else CONT + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return [UNK]
        pieces.append(piece)
        i = j
    return pieces


def wordpiece_encode(documents: DataFrame, vocab: list[str]) -> DataFrame:
    """(doc_id, pieces, n_pieces, n_unk) — the corpus tokenized against
    a learned vocab. Arrow-batched mapInPandas, per-batch word memo;
    pure map over the corpus, no shuffle."""
    vset = set(vocab)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pieces", StringType()),
            StructField("n_pieces", IntegerType()),
            StructField("n_unk", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pieces: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, vset)
                        memo[w] = enc
                    pieces.extend(enc)
                out.append(
                    (
                        doc_id,
                        " ".join(pieces),
                        len(pieces),
                        sum(1 for p in pieces if p == UNK),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "pieces", "n_pieces", "n_unk"]
            )

    return documents.select("doc_id", "text").mapInPandas(run, schema)
