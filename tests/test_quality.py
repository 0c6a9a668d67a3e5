"""Quarantine split semantics (dq_report is oracle-gated via q50)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import quality
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_quarantine_split(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    # plant violations: null orderkey for ~1/10, negative quantity for %7
    dirty = li.withColumn(
        "l_orderkey",
        F.when(F.col("l_linenumber") % 10 == 0, F.lit(None)).otherwise(F.col("l_orderkey")),
    ).withColumn(
        "l_quantity",
        F.when(F.col("l_partkey") % 7 == 0, -F.col("l_quantity")).otherwise(F.col("l_quantity")),
    )
    rules = [quality.not_null("l_orderkey"), quality.positive("l_quantity")]
    good, bad = quality.quarantine(dirty, rules)
    assert good.count() + bad.count() == dirty.count()
    assert good.filter(F.col("l_orderkey").isNull() | (F.col("l_quantity") <= 0)).count() == 0
    # reasons name every failed rule
    both = bad.filter(
        F.col("l_orderkey").isNull() & (F.col("l_quantity") <= 0)
    ).first()
    if both is not None:
        assert set(both["dq_reasons"]) == {"l_orderkey_not_null", "l_quantity_positive"}
    # report counts line up with the quarantine
    report = {r["rule"]: r["n_violations"] for r in quality.dq_report(dirty, rules).collect()}
    assert report["l_orderkey_not_null"] == dirty.filter(F.col("l_orderkey").isNull()).count()
    assert report["l_quantity_positive"] == dirty.filter(~(F.col("l_quantity") > 0)).count()


def test_schema_evolution_merge(spark, tmp_path):
    """mergeSchema read across files with evolving schemas (reference
    K3's merge-schema option on gold writes)."""
    p = str(tmp_path / "evolving")
    spark.range(3).selectExpr("id", "id * 2 AS a").write.parquet(p + "/v1")
    spark.range(3).selectExpr("id", "id * 3 AS b").write.parquet(p + "/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(p + "/v1", p + "/v2")
    assert set(merged.columns) == {"id", "a", "b"}
    assert merged.count() == 6
    assert merged.filter(F.col("a").isNull()).count() == 3  # v2 rows lack a


def test_doc_surprisal_hand_computed(spark):
    """Tiny corpus with hand-countable bigrams: 'aa aa' normalizes to
    itself → bigrams [aa, 'a ', ' a', aa]; 'ab' → [ab]. LM counts:
    aa:2, 'a ':1, ' a':1, ab:1 (total 5, floor_log2=2). bits: aa=2-1=1,
    others=2-0=2. Doc0 = 1+2+2+1 = 6 over 4 grams; doc1 = 2 over 1."""
    from e_commerce_lakehouse_spark.operators import text as T

    docs = spark.createDataFrame(
        [(0, "aa aa"), (1, "ab"), (2, None), (3, "x")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in T.doc_surprisal(docs).collect()}
    assert (got[0].n_bigrams, got[0].surprisal_bits, got[0].mean_bits_x100) == (4, 6, 150)
    assert (got[1].n_bigrams, got[1].surprisal_bits, got[1].mean_bits_x100) == (1, 2, 200)
    # NULL text and single-char text: no signal → NULLs, not zeros
    for d in (2, 3):
        assert got[d].n_bigrams is None
        assert got[d].surprisal_bits is None
        assert got[d].mean_bits_x100 is None


def test_doc_surprisal_pretrained_lm(spark):
    """Scoring under a persisted LM trained on a different corpus:
    boilerplate (high-count bigrams) scores fewer bits than rare text,
    and the trained LM is reused — not retrained on the scored docs."""
    from e_commerce_lakehouse_spark.operators import text as T

    train = spark.createDataFrame(
        [(i, "the common phrase") for i in range(50)] + [(99, "zq")],
        "doc_id long, text string",
    )
    lm = T.char_bigram_lm(train).localCheckpoint()
    score = spark.createDataFrame(
        [(0, "the common phrase"), (1, "zq")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in T.doc_surprisal(score, lm=lm).collect()}
    assert got[0].mean_bits_x100 < got[1].mean_bits_x100


def test_doc_surprisal_oov_scores_max_bits(spark):
    """Out-of-vocabulary bigrams under a PRE-TRAINED LM score
    max-observed-bits + 1 — dropping them would credit the noisiest
    text with the lowest perplexity (signal inversion)."""
    from e_commerce_lakehouse_spark.operators import text as T

    train = spark.createDataFrame(
        [(i, "the common phrase") for i in range(50)],
        "doc_id long, text string",
    )
    lm = T.char_bigram_lm(train).localCheckpoint()
    max_bits = lm.agg(F.max("bits")).first()[0]
    score = spark.createDataFrame(
        [(0, "the common phrase"), (1, "zzqqxxjj")],  # fully OOV doc
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in T.doc_surprisal(score, lm=lm).collect()}
    # the OOV doc scores exactly (max_bits + 1) per bigram
    assert got[1].mean_bits_x100 == (max_bits + 1) * 100
    assert got[1].n_bigrams == 7  # every bigram still counted
    assert got[0].mean_bits_x100 < got[1].mean_bits_x100


def test_mixture_rates_never_zero(spark):
    """A positive-weight source is downsampled, never eliminated: the
    exact-integer floor is clamped at 1 even when the ratio rounds to
    zero percent."""
    from e_commerce_lakehouse_spark.operators import sampling

    rows = [(0, "t", "tiny")] + [
        (i, "t " * 2999 + "t", "huge") for i in range(1, 4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r.rate_pct for r in sampling.mixture_rates(docs, {}).collect()}
    # tiny: 1 token, huge: 9000 tokens, equal weights -> tiny keeps 100,
    # huge floors to 100*1*1 // (1*9000) = 0 -> clamped to 1
    assert got["tiny"] == 100
    assert got["huge"] == 1


def test_gopher_rules_hand_cases(spark):
    """Each Gopher A1.1 rule trips on a purpose-built doc; a healthy
    doc passes all six (mask 0)."""
    from e_commerce_lakehouse_spark.operators import text as text_ops

    good = "the quick brown fox and that dog have fun with " + " ".join(
        f"word{i}" for i in range(45)
    )
    rows = [
        (0, good),                                        # passes
        (1, "the and of short"),                          # word count (bit 0)
        (2, "a " * 60 + "the of"),                        # mean word len < 3 (bit 1)
        (3, good + " " + "# " * 20),                      # symbol ratio (bit 2)
        (4, "\n".join("- bullet line" for _ in range(5))),# bullet lines (bit 3)
        (5, good.replace("word1 ", "###1 ").replace(
            "the quick", "the 123 456 789 " + "12 " * 40 + "quick")),  # alpha (bit 4)
        (6, " ".join(f"w{i}xyz" for i in range(60))),     # no stopwords (bit 5)
        (7, None),                                        # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.gopher_fail_mask, r.gopher_pass)
        for r in text_ops.gopher_quality(df).collect()
    }
    assert got[0] == (0, True)
    assert got[1][0] & 1, got[1]
    assert got[2][0] & 2, got[2]
    assert got[3][0] & 4, got[3]
    assert got[4][0] & 8, got[4]
    assert got[5][0] & 16, got[5]
    assert got[6][0] & 32, got[6]
    assert got[7] == (None, None)


def test_pmi_collocations_vs_float_reference(spark):
    """pmi_x64 must sit within 2 units (~0.03 bits) below the exact
    float 64·log2 PMI for every pair (three floor chains, each
    under-approximating by < 1 unit), and a planted always-adjacent
    pair must outrank every independent pair."""
    import collections
    import math

    from e_commerce_lakehouse_spark.operators import text

    corpus = [
        (1, "new york is a big city"),
        (2, "new york has new people"),
        (3, "big city people like new york"),
        (4, "people like the big new city"),
        (5, None),
        (6, ""),
        (7, "one"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        (r.a, r.b): (r.c_ab, r.pmi_x64)
        for r in text.pmi_collocations(docs, min_count=2).collect()
    }

    toks = [t.split(" ") for _i, t in corpus if t is not None]
    uni = collections.Counter(t for d in toks for t in d)
    bi = collections.Counter(
        (d[i], d[i + 1]) for d in toks for i in range(len(d) - 1)
    )
    t_uni = sum(uni.values())
    t_bi = sum(max(len(d) - 1, 0) for d in toks)
    expect = {
        (a, b): c for (a, b), c in bi.items() if c >= 2
    }
    assert set(got) == set(expect)
    for (a, b), c in expect.items():
        exact = 64 * math.log2(c * t_uni * t_uni / (t_bi * uni[a] * uni[b]))
        c_got, pmi = got[(a, b)]
        assert c_got == c
        assert exact - 3 < pmi <= exact, (a, b, pmi, exact)
    # the fixed-point ranking must agree with the exact float ranking
    # (ties broken by pair for determinism)
    def float_pmi(pair):
        a, b = pair
        return 64 * math.log2(
            expect[pair] * t_uni * t_uni / (t_bi * uni[a] * uni[b])
        )

    ranked_fixed = sorted(got, key=lambda p: (-got[p][1], p))
    ranked_float = sorted(expect, key=lambda p: (-float_pmi(p), p))
    assert ranked_fixed == ranked_float


def test_aho_corasick_matches_brute_force(spark):
    """AC finds exactly the occurrences a position-by-position scan
    finds, including overlapping and nested patterns."""
    import random

    from e_commerce_lakehouse_spark.operators.dictionary import AhoCorasick

    rng = random.Random(7)
    for _ in range(200):
        pats = list(
            {
                "".join(rng.choice("ab") for _ in range(rng.randint(1, 4)))
                for _ in range(rng.randint(1, 6))
            }
        )
        text = "".join(rng.choice("ab") for _ in range(60))
        ac = AhoCorasick(pats)
        got = sorted((e, ac.patterns[i]) for e, i in ac.matches(text))
        want = sorted(
            (i + len(p), p)
            for p in ac.patterns
            for i in range(len(text))
            if text.startswith(p, i)
        )
        assert got == want


def test_dictionary_tag_and_overlap_semantics(spark):
    from e_commerce_lakehouse_spark.operators import dictionary as D

    docs = spark.createDataFrame(
        [
            (1, "the table by the table"),
            (2, "hash value hash"),
            (3, None),
            (4, "aaa"),  # self-overlapping pattern 'aa' -> AC counts 2
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_hits, r.n_distinct, r.hits)
        for r in D.dictionary_tag(docs, ["table", "hash value", "aa"]).collect()
    }
    assert out[1] == (2, 1, "table")
    assert out[2] == (1, 1, "hash value")
    assert out[3] == (0, 0, "")
    # AC counts ALL occurrences: 'aa' twice in 'aaa' (regex would say 1)
    assert out[4] == (2, 1, "aa")

    stats = {
        r.phrase: (r.docs_with, r.n_occurrences)
        for r in D.dictionary_phrase_stats(docs, ["table", "aa", "nope"]).collect()
    }
    assert stats == {"table": (1, 2), "aa": (1, 2), "nope": (0, 0)}

    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        D.AhoCorasick(["", ""])


def test_profile_columns_exact_and_single_shuffle_shape(spark):
    """profile_columns: exact totals/nulls/NDV per column from one
    stacked melt; NDV of an all-null column is 0."""
    from e_commerce_lakehouse_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (2, None, None), (3, "b", None)],
        "k long, s string, z string",
    )
    got = {r.column: r for r in Q.profile_columns(df, ["k", "s", "z"]).collect()}
    assert (got["k"].n_rows, got["k"].n_nulls, got["k"].n_distinct) == (4, 0, 3)
    assert (got["s"].n_rows, got["s"].n_nulls, got["s"].n_distinct) == (4, 1, 2)
    assert (got["z"].n_rows, got["z"].n_nulls, got["z"].n_distinct) == (4, 4, 0)
    # plan shape: ONE Expand-free pass — no Spark distinct-aggregate
    # Expand node (the melt replaces it)
    plan = (
        Q.profile_columns(df, ["k", "s"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan


def test_touch_attribution_hand_case(spark):
    """First/last-touch on a hand-built timeline, incl. a purchase
    with no touches in the lookback (NULL items, 0 touches) and a
    same-timestamp tie broken by event_id."""
    import datetime as dt

    from e_commerce_lakehouse_spark.operators import windows as W

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def row(eid, user, typ, minutes, item=None):
        props = '{"k": %d}' % item if item is not None else None
        return (eid, user, typ, t0 + dt.timedelta(minutes=minutes), props)

    ev = spark.createDataFrame(
        [
            row(1, 1, "view", -90, item=7),
            row(2, 1, "click", -30, item=8),
            row(3, 1, "click", -30, item=9),   # tie with eid 2 -> later id wins last
            row(4, 1, "purchase", 0),
            row(5, 2, "purchase", 0),          # no touches at all
            row(6, 3, "click", -200, item=5),  # outside the 2h lookback
            row(7, 3, "purchase", 0),
        ],
        "event_id long, user_id long, event_type string, ts timestamp, props string",
    )
    got = {r.purchase_id: r for r in W.touch_attribution(ev).collect()}
    assert (got[4].first_item, got[4].last_item, got[4].n_touches) == (7, 9, 3)
    assert (got[5].first_item, got[5].last_item, got[5].n_touches) == (None, None, 0)
    assert (got[7].first_item, got[7].last_item, got[7].n_touches) == (None, None, 0)


def test_zipf_profile_brute_force(spark):
    """zipf_profile vs an independent Python reference: counts, ranks,
    exact fixed-point log coordinates, and the integer least-squares
    slope (truncation toward zero checked on the negated form)."""
    import math
    from collections import Counter

    from e_commerce_lakehouse_spark.operators import text as T

    rows = [
        (1, "a a a a b b b c c d"),
        (2, "a a b c d e e e"),
        (3, None),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.token: (r.freq, r.rank, r.lr_x64, r.lf_x64, r.slope_x64)
        for r in T.zipf_profile(docs, top_n=4).collect()
    }
    cnt = Counter(
        t for _, tx in rows if tx for t in tx.split(" ") if t
    )
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]

    # exact-log assertion via the chain's own contract: the integer
    # part must equal floor(log2) and the value must be within 1/64 of
    # the real log
    for i, (tok, freq) in enumerate(ranked, start=1):
        f, rk, lr, lf, slope = got[tok]
        assert (f, rk) == (freq, i)
        assert lf // 64 == freq.bit_length() - 1
        assert abs(lf / 64 - math.log2(freq)) < 1 / 32
        assert abs(lr / 64 - math.log2(i)) < 1 / 32
    # slope: integer least squares over the same points, toward-zero div
    xs = [got[t][2] for t, _ in ranked]
    ys = [got[t][3] for t, _ in ranked]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    num, den = (sx * sy - n * sxy) * 64, n * sxx - sx * sx
    want = abs(num) // abs(den) * (1 if num * den > 0 else -1) if num else 0
    assert all(got[t][4] == want for t, _ in ranked)
    # NULL/empty docs contribute nothing
    assert sum(f for f, *_ in got.values()) == sum(cnt[t] for t, _ in ranked)


def test_repetition_report_brute_force(spark):
    """repetition_report vs a Python reference: per-n eligible-doc
    counts, the deterministic top-gram tie-break (count DESC, longest,
    lexicographic), and the cross-multiplied threshold verdicts."""
    from collections import Counter

    from e_commerce_lakehouse_spark.operators import text as T

    rows = [
        (1, "spam spam spam spam spam ok"),   # top-2gram 'spam spam' heavy
        (2, "a b c d e f g h"),               # diverse: passes all
        (3, "x y"),                           # only n=2 eligible
        (4, None),
        (5, "solo"),                          # no n eligible
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.n: (r.n_docs, r.n_fail) for r in T.repetition_report(docs).collect()}

    want = {}
    for n, pct in T.REPETITION_THRESHOLDS.items():
        n_docs = n_fail = 0
        for _, tx in rows:
            if tx is None:
                continue
            toks = tx.split(" ")
            if len(toks) < n:
                continue
            n_docs += 1
            grams = Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            top = sorted(
                grams.items(), key=lambda kv: (-kv[1], -len(kv[0]), kv[0])
            )[0]
            if top[1] * len(top[0]) * 100 > pct * len(tx):
                n_fail += 1
        want[n] = (n_docs, n_fail)
    assert got == want
    assert got[2][1] >= 1  # the spam doc fails at least the 2-gram rule
