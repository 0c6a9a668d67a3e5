"""Streaming curation end-to-end (streaming/curation.py): the fused
scoring kernel + gate columns must decide EXACTLY like the batch
operators.curation.corpus_quality_gate, and the wired pipeline
(file stream -> gate -> snapshot MERGE sink) must be exactly-once
across an availableNow restart."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import curation as batch_cur
from e_commerce_lakehouse_spark.sources import snapshots as S
from e_commerce_lakehouse_spark.streaming import curation as stream_cur

DIM = 64
# mildly positive prior, strongly negative on the gibberish word's
# unigram/bigram feature indexes (md5 % 64 of 'zqzqzqzq' / its bigram)
WEIGHTS = [5] * DIM
WEIGHTS[23] = WEIGHTS[16] = -3000
PIECES = (
    [(c, -2.5) for c in "abcdefghijklmnopqrstuvwxyz"]
    + [("the", -1.0), ("token", -1.2), ("and", -1.1), ("data", -1.3)]
)
MAX_PPL = 40.0

GOOD = (
    "the be to of and that have with "
    + " ".join(["token data"] * 25)
)  # 58 words, alpha, stopword-rich -> gopher passes, clf keeps
SHORT = "x y"  # word_count + stopword_presence fail
GIBBERISH = " ".join(["zq" * 4] * 60)  # gopher fail + clf reject
# gopher+clf pass, but digit words have no unigram pieces -> floored
# logp -> perplexity above MAX_PPL: the ppl gate alone rejects
PPL_BAD = (
    "the be to of and that have with "
    + " ".join(["token data"] * 23)
    + " 12345 67890 13579 24680 11223 44556"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


ROWS = [
    (1, GOOD),
    (2, SHORT),
    (3, GIBBERISH),
    (4, None),
    (5, ""),
    (6, GOOD + " extra tail tokens here"),
    (7, PPL_BAD),
]


def _canon(df):
    return sorted(
        (
            r.doc_id,
            r.gopher_pass,
            r.clf_keep,
            None if r.ppl is None else round(r.ppl, 9),
            r.keep,
            tuple(r.reject_reasons),
        )
        for r in df.collect()
    )


def test_stream_gate_decisions_equal_batch_gate(spark):
    """batch==stream pinned: same columns, same verdicts, same reasons,
    bit-equal scores on every row — all gates enabled."""
    docs = _docs(spark, ROWS)
    want = _canon(
        batch_cur.corpus_quality_gate(
            docs, weights=WEIGHTS, dim=DIM, pieces=PIECES, max_ppl=MAX_PPL
        )
    )
    got = _canon(
        stream_cur.streaming_quality_gate(
            docs, weights=WEIGHTS, dim=DIM, pieces=PIECES, max_ppl=MAX_PPL
        )
    )
    assert got == want
    # the fixture exercises every outcome: a kept doc and each gate firing
    keeps = {d: k for d, _, _, _, k, _ in got}
    reasons = {d: r for d, _, _, _, _, r in got}
    assert keeps[1] and not keeps[2]
    assert "gopher" in reasons[2]
    assert "classifier" in reasons[3]
    assert "perplexity" in reasons[7]


def test_stream_gate_partial_gates_equal_batch(spark):
    """Disabled gates (gopher-only, and gopher+classifier) must match
    the batch gate too — NULL scored columns, no spurious reasons."""
    docs = _docs(spark, ROWS)
    for kw in (
        {},
        {"weights": WEIGHTS, "dim": DIM},
        {"pieces": PIECES, "max_ppl": MAX_PPL},
        # pieces WITHOUT max_ppl: the batch gate emits NULL ppl and no
        # perplexity gate — the stream side must match (review fix)
        {"pieces": PIECES},
        {"weights": WEIGHTS, "dim": DIM, "max_ppl": MAX_PPL},
    ):
        want = _canon(batch_cur.corpus_quality_gate(docs, **kw))
        got = _canon(stream_cur.streaming_quality_gate(docs, **kw))
        assert got == want, kw


def _write_batch(src_dir, rows, name):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as fh:
        for doc_id, text in rows:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_curation_stream_end_to_end_exactly_once(spark, tmpdir):
    """events -> score -> gate -> snapshot MERGE sink, availableNow,
    then a RESTART with new files: verdicts match the batch gate, the
    replayed batch no-ops (one manifest commit per stream batch id),
    and re-running with no new data commits nothing."""
    src = str(tmpdir / "src")
    root = str(tmpdir / "curated")
    ckpt = str(tmpdir / "ckpt")
    _write_batch(src, ROWS[:3], "part-0.json")

    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = stream_cur.run_curation_stream(
        stream, root, ckpt, weights=WEIGHTS, dim=DIM,
        pieces=PIECES, max_ppl=MAX_PPL,
    )
    q.awaitTermination(120)
    got1 = S.read_snapshot(spark, root)
    assert got1.count() == 3
    batch_ids_1 = [
        e["meta"].get("stream_batch_id")
        for e in S._load(root)["snapshots"]
        if "stream_batch_id" in e.get("meta", {})
    ]
    assert len(batch_ids_1) == len(set(batch_ids_1)) >= 1

    # restart with three more docs: only the new batch commits
    _write_batch(src, ROWS[3:], "part-1.json")
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = stream_cur.run_curation_stream(
        stream, root, ckpt, weights=WEIGHTS, dim=DIM,
        pieces=PIECES, max_ppl=MAX_PPL,
    )
    q.awaitTermination(120)
    got = S.read_snapshot(spark, root)
    assert got.count() == 7

    # decisions in the table == the batch gate on the same corpus
    want = batch_cur.corpus_quality_gate(
        _docs(spark, ROWS), weights=WEIGHTS, dim=DIM,
        pieces=PIECES, max_ppl=MAX_PPL,
    ).withColumn("reject_reasons", F.concat_ws(",", "reject_reasons"))
    assert _rows(got) == _rows(want)

    # idle restart: the sink sees no new batch -> no new manifest entry
    n_snaps = len(S._load(root)["snapshots"])
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = stream_cur.run_curation_stream(
        stream, root, ckpt, weights=WEIGHTS, dim=DIM,
        pieces=PIECES, max_ppl=MAX_PPL,
    )
    q.awaitTermination(120)
    assert len(S._load(root)["snapshots"]) == n_snaps
    assert S.read_snapshot(spark, root).count() == 7


def _rows(df):
    return sorted(
        (
            r.doc_id,
            r.gopher_pass,
            r.clf_keep,
            None if r.ppl is None else round(r.ppl, 9),
            r.keep,
            r.reject_reasons,
        )
        for r in df.select(
            "doc_id", "gopher_pass", "clf_keep", "ppl", "keep", "reject_reasons"
        ).collect()
    )
