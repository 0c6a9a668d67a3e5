"""Unigram-LM tokenizer (operators/unigram.py, Kudo 2018):

- the lattice forward-backward is verified against BRUTE-FORCE
  enumeration of every segmentation (independent math: explicit
  probability sums, no alpha/beta recursion);
- the distributed trainer is verified against a single-node reference
  that drives the same algorithm over a collected word-frequency dict
  (independent orchestration: seeding, EM, Kudo loss pruning
  reimplemented here), exact piece-table equality via the fixed-point
  E-step sums;
- determinism across partitionings, Viterbi properties, artifact
  round-trip, encode behavior.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import unigram
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


def _enumerate_counts(word: str, logp: dict[str, float], max_len: int):
    """Brute-force expected piece counts: enumerate EVERY segmentation,
    weight by exp(sum logp), normalize."""
    segs: list[list[str]] = []

    def rec(i, cur):
        if i == len(word):
            segs.append(list(cur))
            return
        for j in range(i + 1, min(len(word), i + max_len) + 1):
            p = word[i:j]
            if p in logp:
                cur.append(p)
                rec(j, cur)
                cur.pop()

    rec(0, [])
    if not segs:
        return {}
    weights = [math.exp(sum(logp[p] for p in s)) for s in segs]
    z = sum(weights)
    out: dict[str, float] = {}
    for s, w in zip(segs, weights):
        for p in s:
            out[p] = out.get(p, 0.0) + w / z
    return out


def test_forward_backward_matches_enumeration():
    logp = {
        p: math.log(v)
        for p, v in {
            "a": 0.2, "b": 0.15, "c": 0.1, "ab": 0.25, "bc": 0.2, "abc": 0.1,
        }.items()
    }
    for word in ("abc", "abcabc", "aabbcc", "cab", "abcbcab"):
        got, _z = unigram._forward_backward(word, logp, 3)
        want = _enumerate_counts(word, logp, 3)
        assert set(got) == set(want), word
        for p in want:
            assert got[p] == pytest.approx(want[p], abs=1e-9), (word, p)
    # unsegmentable word -> empty counts
    assert unigram._forward_backward("xyz", logp, 3)[0] == {}


def _ref_train(word_freq: dict[str, int], **kw):
    """Single-node reference trainer: same algorithm over an in-memory
    word-frequency dict. Shares only the lattice function with the
    module — seeding, fixed-point E-step, M-step, and Kudo pruning are
    reimplemented here from the spec."""
    vocab_size = kw.get("vocab_size", 60)
    em_iters = kw.get("em_iters", 2)
    shrink = kw.get("shrink", 0.75)
    max_len = kw.get("max_piece_len", 8)
    seed_size = kw.get("seed_size", 400)
    min_count = kw.get("min_count", 2)

    counts: dict[str, int] = {}
    for w, f in word_freq.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                counts[w[i : i + ln]] = counts.get(w[i : i + ln], 0) + f
    chars = sorted((p, c) for p, c in counts.items() if len(p) == 1)
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1 and c >= min_count),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    seed = chars + multi
    total = sum(c for _, c in seed)
    logp = {p: math.log(c) - math.log(total) for p, c in seed}

    def e_step(model):
        acc: dict[str, int] = {}
        for w, f in word_freq.items():
            cs, _ = unigram._forward_backward(w, model, max_len)
            for p, c in cs.items():
                acc[p] = acc.get(p, 0) + round(c * unigram.COUNT_FP) * f
        return acc

    def m_step(cfp, prev_model):
        # single chars never vanish: floor any char whose fixed-point
        # expected count rounded to 0 (or that the E-step skipped
        # entirely) at one grain — mirrors the segmentability invariant
        adj = dict(cfp)
        for p in list(prev_model) + list(cfp):
            if len(p) == 1 and adj.get(p, 0) <= 0:
                adj[p] = 1
        t = sum(c for c in adj.values() if c > 0)
        return {p: math.log(c) - math.log(t) for p, c in adj.items() if c > 0}

    while True:
        for _ in range(em_iters):
            cfp = e_step(logp)
            logp = m_step(cfp, logp)
        if len(logp) <= vocab_size:
            break
        target = max(vocab_size, math.ceil(len(logp) * shrink))
        char_set = {p for p in logp if len(p) == 1}
        losses = []
        # out-of-model floor = the same floor viterbi scores with:
        # min over the model WITHOUT the candidate, minus 32
        for p, lp in logp.items():
            if p in char_set:
                continue
            rest = dict(logp)
            del rest[p]
            alt = unigram.viterbi(p, rest, max_len)
            floor = min(rest.values()) - 32.0
            alt_lp = sum(rest.get(s, floor) for s in alt)
            losses.append((cfp.get(p, 0) * (lp - alt_lp), p))
        losses.sort(key=lambda t: (-t[0], t[1]))
        keep = char_set | {p for _, p in losses[: max(0, target - len(char_set))]}
        logp = {p: lp for p, lp in logp.items() if p in keep}
    logp = m_step(e_step(logp), logp)
    return sorted(logp.items())


def test_train_matches_single_node_reference(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(40)
    wf = {
        r.word: r.freq
        for r in unigram.word_vocab(docs).collect()
    }
    got = unigram.train_unigram(docs, vocab_size=40, seed_size=60)
    want = _ref_train(wf, vocab_size=40, seed_size=60)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (p, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-12), p


def test_train_partitioning_independent(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(40)
    a = unigram.train_unigram(docs, vocab_size=40, seed_size=60)
    b = unigram.train_unigram(docs.repartition(7), vocab_size=40, seed_size=60)
    assert a == b  # exact float equality: integer E-sums, driver M-step


def test_viterbi_properties():
    logp = {p: math.log(v) for p, v in {
        "a": 0.1, "b": 0.1, "c": 0.1, "ab": 0.3, "abc": 0.4,
    }.items()}
    # whole-word piece dominates two-piece splits
    assert unigram.viterbi("abc", logp, 8) == ["abc"]
    assert unigram.viterbi("ababc", logp, 8) == ["ab", "abc"]
    # segmentation always concatenates back to the word
    for w in ("abcab", "cccab", "abcx"):
        assert "".join(unigram.viterbi(w, logp, 8)) == w
    # unknown char falls back to a single-char floor piece
    assert "x" in unigram.viterbi("abx", logp, 8)


def test_trained_model_learns_frequent_word_as_piece(spark):
    rows = [(i, "spark engine " * 3) for i in range(30)] + [
        (100 + i, "misc tail words here") for i in range(3)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pieces = unigram.train_unigram(docs, vocab_size=30, seed_size=50)
    vocab = {p for p, _ in pieces}
    assert "spark" in vocab and "engine" in vocab
    logp = dict(pieces)
    assert unigram.viterbi("spark", logp, 8) == ["spark"]


def test_piece_table_roundtrip_and_encode(spark, tmpdir):
    docs = load_table(spark, SF_SMALL, "documents").limit(25)
    pieces = unigram.train_unigram(docs, vocab_size=40, seed_size=60)
    path = f"{tmpdir}/pieces"
    unigram.save_piece_table(spark, pieces, path)
    assert unigram.load_piece_table(spark, path) == pieces
    enc = unigram.unigram_encode(docs, pieces).collect()
    assert len(enc) == 25
    for r in enc:
        assert r.n_pieces >= r.n_words  # each word >= 1 piece
        assert len(r.piece_text.split(" ")) == r.n_pieces
    # encode with the reloaded table is identical (the BPE artifact
    # contract, mirrored)
    enc2 = unigram.unigram_encode(
        docs, unigram.load_piece_table(spark, path)
    ).collect()
    assert sorted(map(tuple, enc)) == sorted(map(tuple, enc2))


def test_em_iters_guard(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    with pytest.raises(ValueError, match="em_iters"):
        unigram.train_unigram(docs, em_iters=0)


def test_alphabet_larger_than_vocab_terminates(spark):
    """A corpus with more distinct characters than vocab_size must
    terminate with the alphabet as the vocabulary floor (review fix:
    the prune loop previously spun forever — single chars are never
    dropped, so nothing could shrink)."""
    text = " ".join("".join(chr(97 + (i + j) % 26) + str(j % 10) for j in range(3)) for i in range(20))
    docs = spark.createDataFrame([(1, text), (2, text[::-1])], "doc_id long, text string")
    pieces = unigram.train_unigram(docs, vocab_size=5, seed_size=10)
    vocab = [p for p, _ in pieces]
    assert len(vocab) >= 5  # alphabet floor, not an infinite loop
    assert all(len(p) == 1 for p in vocab)


def test_m_step_single_char_floor():
    """A char whose fixed-point expected count rounds to 0 (or that the
    E-step skipped entirely) survives the M-step with a one-grain
    floor — dropping it would make every word containing it
    unsegmentable (_forward_backward returns ({}, -inf)) and silently
    drop that word's mass from all later EM rounds. Multi-char pieces
    at 0 still drop."""
    got = unigram._m_step({"a": 0, "ab": 100}, prev_pieces={"b", "cd"})
    assert set(got) == {"a", "ab", "b"}
    assert got["a"] == got["b"] == math.log(1) - math.log(102)
    assert got["ab"] == math.log(100) - math.log(102)


def test_doc_perplexity_separates_gibberish(spark):
    """CCNet-style filter signal: under a model trained on the clean
    corpus, in-distribution docs score LOWER perplexity than
    character gibberish; values equal the direct single-node
    computation exactly (pure map), and NULL/empty text scores
    NULL."""
    import math as _math

    from e_commerce_lakehouse_spark.operators import unigram as U

    corpus = [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    pieces = U.train_unigram(docs, vocab_size=40, em_iters=2)

    probe = spark.createDataFrame(
        [
            (0, "the quick fox"),
            (1, "zq xv qq zzk vxw"),
            (2, None),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in U.doc_perplexity(probe, pieces).collect()}
    assert got[0].ppl < got[1].ppl  # clean beats gibberish
    assert got[2].ppl is None and got[3].ppl is None
    # exact single-node parity
    logp = dict(pieces)
    for doc_id, text in [(0, "the quick fox"), (1, "zq xv qq zzk vxw")]:
        lp, n = 0.0, 0
        for w in text.split(" "):
            segs = U.viterbi(w, logp, 8)
            n += len(segs)
            lp += U.word_logp(w, logp, 8)
        assert got[doc_id].n_pieces == n
        assert got[doc_id].total_logp == lp
        assert got[doc_id].ppl == _math.exp(-lp / n)
