"""Hashed-ngram quality classifier (operators/classifier.py):
distributed training equals an INDEPENDENT single-node reference
bit-for-bit (the all-integer Q16 discipline makes gradient sums
associative), the trained filter separates planted good/bad corpora,
and scoring is partitioning-independent."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import classifier as C


def _trunc_div(a: int, b: int) -> int:
    """Spark's integer `div` truncates toward zero; Python's // floors."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _ref_features(rows, dim, bigrams=True):
    """Single-node mirror of hashed_features: doc -> {idx: x_q}."""
    out = {}
    for doc_id, text in rows:
        toks = C.tokenize_py(text)
        grams = list(toks)
        if bigrams:
            grams += [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            continue
        cnt: dict[int, int] = {}
        for g in grams:
            cnt[C._hash_py(g, dim)] = cnt.get(C._hash_py(g, dim), 0) + 1
        total = sum(cnt.values())
        out[doc_id] = {j: _trunc_div(c * C.ONE, total) for j, c in cnt.items()}
    return out


def _ref_sigmoid(m_q: int) -> int:
    i = _trunc_div(m_q + 8 * C.ONE, 4096)
    return C.SIG_TABLE_X16[max(0, min(256, i))]


def _ref_train(rows, labels, dim, iters, lr):
    feats = _ref_features(rows, dim)
    lr_num, lr_den = lr
    n = len(labels)
    w = [0] * dim
    for _ in range(iters):
        grad: dict[int, int] = {}
        for doc_id, y in labels.items():
            x = feats.get(doc_id, {})
            m = sum(_trunc_div(w[j] * v, C.ONE) for j, v in x.items())
            e = _ref_sigmoid(m) - y * C.ONE
            for j, v in x.items():
                grad[j] = grad.get(j, 0) + _trunc_div(e * v, C.ONE)
        for j, g in grad.items():
            w[j] -= (lr_num * g) // (lr_den * n)
    return w


def _corpus(n=120, seed=3):
    """Planted separable corpus: 'good' docs draw from an articulate
    vocabulary, 'bad' docs from spam tokens; a few words overlap."""
    rng = random.Random(seed)
    good_v = "the quick analysis shows careful measured results with clear evidence and sound method".split()
    bad_v = "click free winner cash xxx buy now casino pills winner free click".split()
    shared = "the and with report".split()
    rows, labels = [], {}
    for i in range(n):
        y = i % 2
        vocab = (good_v if y else bad_v) + shared
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(30))))
        labels[i] = y
    return rows, labels


def test_training_matches_single_node_reference(spark):
    rows, labels = _corpus()
    dim, iters, lr = 512, 2, (4, 1)
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    lab = spark.createDataFrame(list(labels.items()), "doc_id long, label int")
    got = C.train_quality_classifier(
        C.hashed_features(docs, dim=dim), lab, dim=dim, iters=iters, lr=lr
    )
    want = _ref_train(rows, labels, dim, iters, lr)
    assert got == want  # bit-for-bit, any partitioning


def test_classifier_separates_planted_corpora(spark):
    rows, labels = _corpus(n=150)
    dim = 1024
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lab = spark.createDataFrame(list(labels.items()), "doc_id long, label int")
    w = C.train_quality_classifier(
        C.hashed_features(docs, dim=dim), lab, dim=dim, iters=5
    )
    scored = C.score_documents(docs, w, dim=dim)
    joined = scored.join(lab, "doc_id")
    acc = (
        joined.select(
            (F.col("keep").cast("int") == F.col("label")).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95, acc
    # probabilities come from the shared table and are well-formed
    mm = scored.agg(
        F.min("prob_x16").alias("lo"), F.max("prob_x16").alias("hi")
    ).first()
    assert 0 <= mm.lo <= mm.hi <= C.ONE


def test_scoring_handles_empty_docs_and_is_deterministic(spark):
    rows = [(0, "good text here"), (1, ""), (2, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = [100] * 64
    s1 = sorted(tuple(r) for r in C.score_documents(docs, w, dim=64).collect())
    s2 = sorted(
        tuple(r)
        for r in C.score_documents(docs.repartition(5), w, dim=64).collect()
    )
    assert s1 == s2
    by_id = {r[0]: r for r in s1}
    assert by_id[1][1] == 0 and by_id[2][1] == 0  # empty -> margin 0
    assert by_id[1][2] == C.SIG_TABLE_X16[128]  # prob 0.5 from the table


def test_empty_label_frame_raises(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no labeled"):
        C.train_quality_classifier(
            C.hashed_features(docs, dim=8),
            spark.createDataFrame([], "doc_id long, label int"),
            dim=8,
        )


def test_weights_round_trip_and_streaming_scoring(spark, tmp_path):
    """Train once, persist, reload, score a STREAM: scoring is a pure
    map + broadcast join, so the same score_documents call works under
    Structured Streaming (availableNow) and equals the batch scores."""
    import os

    from e_commerce_lakehouse_spark.operators import classifier as C

    docs = spark.createDataFrame(
        [(i, "good clean text here" if i % 2 == 0 else "spam spam buy now")
         for i in range(8)],
        "doc_id long, text string",
    )
    labels = docs.selectExpr("doc_id", "CAST(doc_id % 2 = 0 AS INT) AS label")
    feats = C.hashed_features(docs, dim=256)
    w = C.train_quality_classifier(feats, labels, dim=256, iters=4)
    p = str(tmp_path / "weights")
    C.save_weights(spark, w, p)
    w2 = C.load_weights(spark, p)
    assert w2 == w

    batch = {r.doc_id: r for r in C.score_documents(docs, w2, dim=256).collect()}
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        C.score_documents(
            spark.readStream.schema(docs.schema).parquet(src), w2, dim=256
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    assert set(streamed) == set(batch)
    for d in batch:
        assert (streamed[d].margin_q, streamed[d].keep) == (
            batch[d].margin_q,
            batch[d].keep,
        )
