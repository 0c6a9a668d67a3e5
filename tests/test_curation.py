"""Composed quality gate (operators/curation.py): each sub-gate's
verdict flows into keep/reject_reasons; disabled gates neither join
nor reject."""

from __future__ import annotations

from e_commerce_lakehouse_spark.operators import classifier as C
from e_commerce_lakehouse_spark.operators import curation, unigram


def test_quality_gate_reasons_and_composition(spark):
    clean = "the quick brown fox jumps over the lazy dog and runs home today"
    docs = spark.createDataFrame(
        [
            (0, " ".join([clean] * 4)),            # passes everything
            (1, "zz " * 200),                      # repetitive -> gopher
            (2, "zq xv qq " * 30),                 # gibberish -> perplexity
        ],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(i, " ".join([clean] * 3)) for i in range(6)]
        + [(10 + i, "buy now spam click here " * 8) for i in range(6)],
        "doc_id long, text string",
    )
    labels = train.selectExpr("doc_id", "CAST(doc_id < 10 AS INT) AS label")
    w = C.train_quality_classifier(
        C.hashed_features(train, dim=256), labels, dim=256, iters=4
    )
    pieces = unigram.train_unigram(
        spark.createDataFrame([(0, clean)], "doc_id long, text string"),
        vocab_size=40,
        em_iters=2,
    )
    ppl0 = {
        r.doc_id: r.ppl
        for r in unigram.doc_perplexity(docs, pieces).collect()
    }
    cut = (ppl0[0] + ppl0[2]) / 2  # between clean and gibberish

    got = {
        r.doc_id: r
        for r in curation.corpus_quality_gate(
            docs, weights=w, dim=256, pieces=pieces, max_ppl=cut
        ).collect()
    }
    assert got[0].keep and got[0].reject_reasons == []
    assert not got[1].keep and "gopher" in got[1].reject_reasons
    assert not got[2].keep and "perplexity" in got[2].reject_reasons

    # gates off -> only gopher decides, no ppl/clf columns populated
    solo = {
        r.doc_id: r for r in curation.corpus_quality_gate(docs).collect()
    }
    assert solo[0].keep and solo[0].ppl is None and solo[0].clf_keep is None
    assert not solo[1].keep
    assert solo[2].reject_reasons == [] or "perplexity" not in solo[2].reject_reasons


def test_quality_gate_classifier_rejects_spam(spark):
    spam = "buy now spam click here " * 8
    clean = "the quick brown fox jumps over the lazy dog and runs home today"
    docs = spark.createDataFrame(
        [(0, " ".join([clean] * 4)), (1, " ".join([spam] * 2))],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(i, " ".join([clean] * 3)) for i in range(8)]
        + [(10 + i, spam) for i in range(8)],
        "doc_id long, text string",
    )
    labels = train.selectExpr("doc_id", "CAST(doc_id < 10 AS INT) AS label")
    w = C.train_quality_classifier(
        C.hashed_features(train, dim=256), labels, dim=256, iters=6
    )
    got = {
        r.doc_id: r
        for r in curation.corpus_quality_gate(docs, weights=w, dim=256).collect()
    }
    assert got[0].clf_keep is True
    if not got[1].keep:
        # spam may also trip gopher repetition; the classifier reason
        # must be present when its own verdict is reject
        if got[1].clf_keep is False:
            assert "classifier" in got[1].reject_reasons


def test_quality_gate_rejects_null_text(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog " * 3), (1, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in curation.corpus_quality_gate(docs).collect()}
    assert not got[1].keep and "gopher" in got[1].reject_reasons
