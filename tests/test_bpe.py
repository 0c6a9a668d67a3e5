"""BPE training/encoding (operators/bpe.py) against an INDEPENDENT
pure-Python reference implementation of Sennrich et al. 2016: same
word-frequency formulation, same (count desc, lexicographic) tie-break,
same left-to-right non-overlapping merge application."""

from __future__ import annotations

from collections import Counter

from e_commerce_lakehouse_spark.operators import bpe


def _ref_train(word_freq: dict[str, int], num_merges: int, min_count: int = 2):
    """Reference BPE trainer over a word-frequency dict."""
    vocab = {w: list(w) + [bpe.END_OF_WORD] for w in word_freq}
    merges = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] += word_freq[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_count:
            break
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (1, "low low low low low lower lower newest newest"),
    (2, "newest newest newest newest widest widest widest"),
    (3, "low newest the the the the"),
]


def test_train_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    words = Counter(w for _, t in CORPUS for w in t.split(" "))
    want_merges, want_vocab = _ref_train(dict(words), 12)
    got_merges, got_vocab = bpe.train_bpe(docs, num_merges=12)
    assert got_merges == want_merges
    got = {r.word: (r.freq, list(r.syms)) for r in got_vocab.collect()}
    assert got == {w: (c, want_vocab[w]) for w, c in words.items()}
    # the classic example learns real subwords, not a degenerate chain
    assert ("lo", "w") in got_merges or ("l", "ow") in got_merges


def test_train_partitioning_independent(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    a, _ = bpe.train_bpe(docs, num_merges=8)
    b, _ = bpe.train_bpe(docs.repartition(7), num_merges=8)
    assert a == b


def test_train_early_stop(spark):
    # every word unique, freq 1 -> no pair reaches min_count=2
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    merges, _ = bpe.train_bpe(docs, num_merges=5, min_count=2)
    assert merges == []


def test_encode_matches_reference_apply(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, vocab = bpe.train_bpe(docs, num_merges=12)
    enc = {r.doc_id: r for r in bpe.bpe_encode(docs, merges).collect()}
    # the trained vocab's segmentation IS the reference encoding for
    # in-corpus words
    segs = {r.word: list(r.syms) for r in vocab.collect()}
    for doc_id, text in CORPUS:
        words = text.split(" ")
        want = [s for w in words for s in segs[w]]
        assert enc[doc_id].bpe_text.split(" ") == want
        assert enc[doc_id].n_words == len(words)
        assert enc[doc_id].n_symbols == len(want)
    # out-of-vocab words still segment deterministically via rank-chasing
    oov = spark.createDataFrame([(9, "lowest")], "doc_id long, text string")
    out = bpe.bpe_encode(oov, merges).collect()[0]
    assert "".join(out.bpe_text.split(" ")) == "lowest" + bpe.END_OF_WORD


def test_encode_null_text(spark):
    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = bpe.bpe_encode(docs, [("a", "b")]).collect()[0]
    assert r.bpe_text is None and r.n_words is None


def test_merge_table_round_trip(spark, tmp_path):
    """save -> load reconstructs the merge list exactly (order included)
    and encoding with the reloaded table equals encoding with the
    in-memory list."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, vocab = bpe.train_bpe(docs, num_merges=8)
    assert merges, "fixture must learn at least one merge"
    path = str(tmp_path / "merges.parquet")
    bpe.save_merge_table(spark, merges, path)
    reloaded = bpe.load_merge_table(spark, path)
    assert reloaded == merges
    a = {r.doc_id: r.bpe_text for r in bpe.bpe_encode(docs, merges).collect()}
    b = {r.doc_id: r.bpe_text for r in bpe.bpe_encode(docs, reloaded).collect()}
    assert a == b


def test_batched_training_equals_sequential(spark):
    """batch_merges must not change the learned sequence: tie-heavy and
    conflict-heavy corpora (shared symbols between top pairs, exact
    count ties) against the sequential reference AND batch=1."""
    corpora = [
        # heavy symbol sharing: 'aa' chains force conflicts at the top
        [(1, "aaaa aaab abab baba"), (2, "aaab abba aaaa aaaa")],
        # exact ties everywhere: uniform frequencies
        [(1, "ab cd ef gh"), (2, "ab cd ef gh"), (3, "ab cd ef gh")],
        CORPUS,
    ]
    for rows in corpora:
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        wf = {}
        for _, t in rows:
            for w in t.split(" "):
                wf[w] = wf.get(w, 0) + 1
        ref, _ = _ref_train(wf, 12)
        batched, _ = bpe.train_bpe(docs, num_merges=12, batch_merges=8)
        single, _ = bpe.train_bpe(docs, num_merges=12, batch_merges=1)
        assert batched == ref, rows
        assert single == ref, rows


def test_batch_merges_guard(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="batch_merges"):
        bpe.train_bpe(docs, batch_merges=0)
