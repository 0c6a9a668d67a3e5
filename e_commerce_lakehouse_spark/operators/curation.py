"""Composed corpus-curation gate — the CCNet/RedPajama quality
pipeline end-to-end (engine extension; no reference analog — the
reference has no text tier at all).

Published LLM-corpus pipelines stack three kinds of filter:
heuristic rules (Gopher, Rae et al. 2021 — operators/text.py),
a trained quality classifier (GPT-3 appendix A / Llama wiki-ref —
operators/classifier.py), and a language-model perplexity bucket
(CCNet, Wenzek et al. 2020 — operators/unigram.py). Each exists here
as an independently-verified operator; this module is the composition
a pipeline owner actually runs: one call, one frame out, per-document
keep/reject with the REASONS attached (the part ad-hoc compositions
always drop, and the part an audit needs).

Execution shape: three independent per-doc frames (each a single
corpus pass — profile scan, hashed-feature scan + broadcast weights,
Arrow perplexity map) joined on doc_id. At 100 TB the joins shuffle
doc-id-sized rows only (text never rides past each operator's first
select); any gate can be disabled by passing None, and disabled gates
neither scan nor join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text


def corpus_quality_gate(
    docs: DataFrame,
    weights: list[int] | None = None,
    dim: int = 4096,
    pieces: list[tuple[str, float]] | None = None,
    max_ppl: float | None = None,
) -> DataFrame:
    """(doc_id, gopher_pass, clf_keep, ppl, keep, reject_reasons):
    keep = every ENABLED gate passes; ``reject_reasons`` lists the
    failing gate names (empty array for kept docs). Gates:

    - ``gopher``: always on — text.doc_profile's Gopher rule mask;
    - ``classifier``: on when ``weights`` given — the trained
      fastText-style filter (classifier.score_documents ``keep``);
    - ``perplexity``: on when ``pieces`` AND ``max_ppl`` given —
      unigram doc perplexity above the threshold rejects (empty/NULL
      text has no ppl and does NOT fail this gate; Gopher already
      rejects degenerate docs).
    """
    # doc_profile carries the documents-table lang/source columns
    # through; a bare (doc_id, text) corpus gates fine with them null
    profiled = docs
    for c in ("lang", "source"):
        if c not in profiled.columns:
            profiled = profiled.withColumn(c, F.lit(None).cast("string"))
    out = text.doc_profile(profiled).select("doc_id", "gopher_pass")
    # NULL text yields a NULL gopher_pass — coalesce to False or
    # failed-extraction rows would slip through with keep=true and an
    # empty reasons array (NULL conditions vanish from the filter)
    gates = [("gopher", F.coalesce(F.col("gopher_pass"), F.lit(False)))]
    if weights is not None:
        from . import classifier

        scored = classifier.score_documents(docs, weights, dim=dim).select(
            "doc_id", F.col("keep").alias("clf_keep")
        )
        out = out.join(scored, "doc_id", "left")
        gates.append(("classifier", F.coalesce("clf_keep", F.lit(True))))
    else:
        out = out.withColumn("clf_keep", F.lit(None).cast("boolean"))
    if pieces is not None and max_ppl is not None:
        from . import unigram

        ppl = unigram.doc_perplexity(docs, pieces).select("doc_id", "ppl")
        out = out.join(ppl, "doc_id", "left")
        gates.append(
            ("perplexity", F.coalesce(F.col("ppl") <= max_ppl, F.lit(True)))
        )
    else:
        out = out.withColumn("ppl", F.lit(None).cast("double"))
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
