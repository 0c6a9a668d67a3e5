"""Streaming corpus curation — the batch ``operators.curation``
quality gate re-expressed as an append-mode Structured Streaming
pipeline: documents stream in, every ENABLED gate scores each row,
kept/rejected verdicts (with reasons) flow to an exactly-once snapshot
MERGE sink. The realtime filter+serve shape of the reference's
streaming flow (streaming_flow.py:213-235 filters a parsed stream and
serves the survivors) applied to the LLM-data tier.

Why a separate path exists at all: the batch gate composes three
per-doc frames and JOINS them on doc_id — a stream-stream join needs
watermarks and delays results, and ``text.doc_profile``'s groupBy is a
streaming aggregation. But none of the gate MATH needs a shuffle:

- the Gopher mask (``text.gopher_fail_mask``) is already one pure
  Column expression;
- the classifier margin is already a pure row map (the Arrow kernel
  ``classifier._margins_stream`` uses);
- unigram perplexity is already a pure row map (``_word_score``).

So the streaming gate is ONE fused ``mapInPandas`` kernel (margin +
perplexity in a single Arrow pass, per-batch token/word memos) plus
pure-Column gopher/verdict columns — no shuffle, no state store, no
watermark; it runs identically on a batch frame, which is how the
batch==stream parity test pins the decisions to
``operators.curation.corpus_quality_gate`` bit for bit.

At 100 TB-scale streaming ingest the whole gate is map-side: each
micro-batch scores with broadcast-size closures (dim-bounded weights,
vocab-bounded piece table) and only the verdict columns ride to the
sink's shuffle (the MERGE sink's upsert)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..operators import text as _text
from ..operators.classifier import (
    ONE,
    _check_weight_dim,
    _margin_py,
    _sigmoid_expr,
)
from ..operators.unigram import _doc_ppl


def _score_kernel(
    docs: DataFrame,
    weights: list[int] | None,
    dim: int,
    pieces: list[tuple[str, float]] | None,
    bigrams: bool = True,
) -> DataFrame:
    """(input columns...) + (margin_q, ppl) in one Arrow pass. Margin
    arithmetic mirrors ``classifier._margins_stream`` exactly (same
    tokenizer, md5 hash, Q16 tf quantization, truncating division);
    perplexity mirrors ``unigram.doc_perplexity`` exactly (same
    ``_word_score`` Viterbi segmentation, same memo). Disabled gates
    (None) emit NULL without computing."""
    logp = dict(pieces) if pieces is not None else None
    floor = (min(logp.values()) if logp else 0.0) - 32.0
    in_fields = list(docs.schema.fields)
    schema = StructType(
        in_fields
        + [StructField("margin_q", LongType()), StructField("ppl", DoubleType())]
    )
    cols = [f.name for f in in_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_memo: dict[str, int] = {}
        word_memo: dict[str, tuple[int, float]] = {}
        for pdf in batches:
            margins, ppls = [], []
            for text in pdf["text"]:
                margins.append(
                    None
                    if weights is None
                    else _margin_py(text, weights, dim, bigrams, idx_memo)
                )
                ppls.append(
                    None
                    if logp is None
                    else _doc_ppl(text, logp, 8, floor, word_memo)[2]
                )
            out = pdf[cols].copy()
            # object dtype keeps None as NULL (float64 would coerce to
            # NaN, which Arrow ships as NaN, not NULL)
            out["margin_q"] = pd.Series(margins, dtype="object")
            out["ppl"] = pd.Series(ppls, dtype="object")
            yield out

    return docs.mapInPandas(run, schema)


def streaming_quality_gate(
    docs: DataFrame,
    weights: list[int] | None = None,
    dim: int = 4096,
    pieces: list[tuple[str, float]] | None = None,
    max_ppl: float | None = None,
) -> DataFrame:
    """Streaming analog of ``operators.curation.corpus_quality_gate``:
    same output columns (doc_id, gopher_pass, clf_keep, ppl, keep,
    reject_reasons — decisions pytest-pinned equal to the batch gate
    on the same rows), computed without any shuffle so it runs under
    append mode with no watermark. Works on batch frames too (it is a
    plain DataFrame transform)."""
    if weights is not None:
        _check_weight_dim(weights, dim)
    # the batch gate computes ppl only when BOTH pieces and max_ppl are
    # given; mirror that or the output ppl column diverges (and the
    # kernel would pay per-row Viterbi work for a gate that can never
    # reject)
    scored = _score_kernel(
        docs.select("doc_id", "text"),
        weights,
        dim,
        pieces if max_ppl is not None else None,
    )
    mask = _text.gopher_fail_mask("text")
    out = scored.select(
        "doc_id",
        (mask == 0).alias("gopher_pass"),
        "margin_q",
        "ppl",
    )
    # the batch gate's exact gate conditions (curation.py): NULL text
    # fails gopher; a disabled/NULL-scored gate never rejects
    gates = [("gopher", F.coalesce(F.col("gopher_pass"), F.lit(False)))]
    if weights is not None:
        clf_keep = (
            _sigmoid_expr("coalesce(margin_q, 0)") >= ONE // 2
        ).alias("clf_keep")
        out = out.withColumn("clf_keep", clf_keep)
        gates.append(("classifier", F.coalesce("clf_keep", F.lit(True))))
    else:
        out = out.withColumn("clf_keep", F.lit(None).cast("boolean"))
    if pieces is not None and max_ppl is not None:
        gates.append(
            ("perplexity", F.coalesce(F.col("ppl") <= max_ppl, F.lit(True)))
        )
    reasons = F.filter(
        F.array(
            *[
                F.when(~cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in gates
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return out.select(
        "doc_id",
        "gopher_pass",
        "clf_keep",
        "ppl",
        (F.size(reasons) == 0).alias("keep"),
        reasons.alias("reject_reasons"),
    )


def run_curation_stream(
    docs_stream: DataFrame,
    root: str,
    checkpoint: str,
    weights: list[int] | None = None,
    dim: int = 4096,
    pieces: list[tuple[str, float]] | None = None,
    max_ppl: float | None = None,
):
    """Wire the gate end-to-end: documents stream → fused scoring
    kernel → verdict columns → exactly-once snapshot MERGE sink keyed
    on doc_id (``foreach_batch_merge_snapshot``: the stream batch id
    commits atomically with the rows, so a restart replaying the last
    in-flight batch no-ops). ``reject_reasons`` is sunk as a
    JSON-ready csv string so the snapshot table stays
    footer-stats-friendly. Returns the started query (availableNow);
    caller awaits termination."""
    from .sinks import foreach_batch_merge_snapshot

    gated = streaming_quality_gate(
        docs_stream, weights, dim, pieces, max_ppl
    ).withColumn("reject_reasons", F.concat_ws(",", "reject_reasons"))
    return (
        gated.writeStream.foreachBatch(
            foreach_batch_merge_snapshot(root, ["doc_id"])
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
