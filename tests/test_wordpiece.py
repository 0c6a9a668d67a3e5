"""WordPiece training/encoding (operators/wordpiece.py) against an
INDEPENDENT pure-Python reference of the Schuster & Nakajima / HF
trainer: same likelihood score c/(cnt_a*cnt_b) from exact integer
counts, same (score desc, lexicographic) tie-break, same greedy
longest-match encoder."""

from __future__ import annotations

from collections import Counter

from e_commerce_lakehouse_spark.operators import wordpiece as wp


def _ref_train(word_freq: dict[str, int], num_merges: int, min_count: int = 2):
    """Reference WordPiece trainer over a word-frequency dict."""
    def init(w):
        return [w[0]] + [wp.CONT + ch for ch in w[1:]]

    vocab = {w: init(w) for w in word_freq}
    token_vocab = sorted({s for syms in vocab.values() for s in syms})
    merges = []
    for _ in range(num_merges):
        pair_c: Counter = Counter()
        sym_c: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freq[w]
            for s in syms:
                sym_c[s] += f
            for pair in zip(syms, syms[1:]):
                pair_c[pair] += f
        # spec: score = c / double(cnt_a * cnt_b) — the product is the
        # EXACT integer, rounded once by the double conversion (what
        # the Spark side's long-product-then-cast computes)
        cands = [
            (c / float(sym_c[a] * sym_c[b]), a, b)
            for (a, b), c in pair_c.items()
            if c >= min_count
        ]
        if not cands:
            break
        # max score; ties -> lexicographically smallest (a, b)
        best = min(cands, key=lambda t: (-t[0], t[1], t[2]))
        _, a, b = best
        merges.append((a, b))
        merged = a + (b[len(wp.CONT):] if b.startswith(wp.CONT) else b)
        token_vocab.append(merged)
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, token_vocab, vocab


CORPUS = [
    (1, "hug hug hug hug pug pug bug hug pun pun"),
    (2, "hugs hugs bun bun bun pun hug pug"),
    (3, "bug bug hugs un un un unhug"),
]


def test_train_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    words = Counter(w for _, t in CORPUS for w in t.split(" "))
    want_m, want_tv, want_v = _ref_train(dict(words), 10)
    got_m, got_tv, got_v = wp.train_wordpiece(docs, num_merges=10)
    assert got_m == want_m
    assert got_tv == want_tv
    got = {r.word: list(r.syms) for r in got_v.collect()}
    assert got == dict(want_v)
    # the likelihood score must NOT pick the raw-count argmax here:
    # rare-but-exclusive pairs outrank frequent promiscuous ones
    pair_counts: Counter = Counter()
    for w, c in words.items():
        syms = [w[0]] + [wp.CONT + ch for ch in w[1:]]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
    count_argmax = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert got_m[0] != count_argmax  # distinguishes WordPiece from BPE


def test_train_partitioning_independent(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    a, av, _ = wp.train_wordpiece(docs, num_merges=6)
    b, bv, _ = wp.train_wordpiece(docs.repartition(7), num_merges=6)
    assert a == b
    assert av == bv


def test_encode_greedy_longest_match(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    _, token_vocab, _ = wp.train_wordpiece(docs, num_merges=10)
    vset = set(token_vocab)
    # greedy property on a known vocab
    assert wp.encode_word("hug", vset)[0].startswith("h")
    for w in ("hug", "hugs", "pun", "unhug"):
        enc = wp.encode_word(w, vset)
        if enc != [wp.UNK]:
            # round-trip: pieces reassemble the word
            assert enc[0] + "".join(p[len(wp.CONT):] for p in enc[1:]) == w
            assert all(
                (i == 0) != p.startswith(wp.CONT) or i > 0
                for i, p in enumerate(enc)
            )
    # a word with an out-of-alphabet char is wholly UNK
    assert wp.encode_word("hug!", vset) == [wp.UNK]
    enc_df = {r.doc_id: r for r in wp.wordpiece_encode(docs, token_vocab).collect()}
    for doc_id, text in CORPUS:
        want = []
        for w in text.split(" "):
            want.extend(wp.encode_word(w, vset))
        assert enc_df[doc_id].pieces == " ".join(want)
        assert enc_df[doc_id].n_pieces == len(want)
        assert enc_df[doc_id].n_unk == want.count(wp.UNK)


def test_encode_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in wp.wordpiece_encode(docs, ["a"]).collect()}
    assert rows[1].n_pieces == 0 and rows[2].n_pieces == 0


def test_train_early_stop(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    merges, tv, _ = wp.train_wordpiece(docs, num_merges=5, min_count=2)
    assert merges == []
    assert tv == sorted({"a", "c", "e", "##b", "##d", "##f"})
