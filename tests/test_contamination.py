"""Benchmark-decontamination gates: a corpus doc that quotes a
benchmark doc verbatim MUST be flagged with the exact shared-gram
count; disjoint docs must not appear; the benchmark side must be on
the broadcast side of the plan (the corpus never shuffles)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import dedup

BENCH_TEXT = "the capital of france is paris and the capital of italy is rome"


def _frames(spark):
    bench = spark.createDataFrame(
        [(0, BENCH_TEXT), (1, "completely unrelated benchmark question here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim leak of bench doc 0 inside a longer doc
            (100, "intro words " + BENCH_TEXT + " trailing words"),
            # near-miss sharing exactly two bigrams with bench doc 0
            # ("the capital", "capital of")
            (101, "what is the capital of germany"),
            # disjoint
            (102, "numpy arrays broadcast along their trailing axes"),
            # too short for bigrams (ngram_set guard)
            (103, "one"),
        ],
        "doc_id long, text string",
    )
    return corpus, bench


def test_verbatim_leak_flagged_with_exact_count(spark):
    corpus, bench = _frames(spark)
    rows = {
        (r.doc_id, r.bench_id): r.n_shared_grams
        for r in dedup.contamination_pairs(corpus, bench, n=2, min_overlap=5).collect()
    }
    # bench doc 0 has 12 distinct bigrams; doc 100 contains them all
    # plus the two splice-boundary bigrams, which are not in the bench
    # set — the count is exactly the bench gram count
    n_bench_grams = len(
        dict.fromkeys(
            f"{a} {b}"
            for a, b in zip(BENCH_TEXT.split(" "), BENCH_TEXT.split(" ")[1:])
        )
    )
    assert rows == {(100, 0): n_bench_grams}


def test_threshold_excludes_near_miss(spark):
    corpus, bench = _frames(spark)
    low = dedup.contamination_pairs(corpus, bench, n=2, min_overlap=2).collect()
    counts = {(r.doc_id, r.bench_id): r.n_shared_grams for r in low}
    assert counts[(101, 0)] == 2  # the two shared bigrams, exactly
    assert (102, 0) not in counts and (102, 1) not in counts
    # raising the bar drops the near-miss but keeps the verbatim leak
    high = {
        (r.doc_id, r.bench_id)
        for r in dedup.contamination_pairs(corpus, bench, n=2, min_overlap=5).collect()
    }
    assert (101, 0) not in high and (100, 0) in high


def test_gpt3_13gram_preset_single_hit(spark):
    """The published single-hit rule (GPT-3 appendix C, PaLM style):
    ONE verbatim 13-gram shared with a benchmark doc flags the pair;
    a 12-token verbatim overlap does not."""
    bench13 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"
    assert len(bench13.split()) == 13
    bench = spark.createDataFrame(
        [(0, bench13)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # verbatim 13-gram leak inside a longer doc
            (200, "preamble text " + bench13 + " epilogue text"),
            # only the first 12 tokens — no shared 13-gram
            (201, "preamble " + " ".join(bench13.split()[:12]) + " zulu"),
            (202, "entirely disjoint vocabulary in this training document"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.bench_id): r.n_shared_grams
        for r in dedup.contamination_pairs(
            corpus, bench, preset="gpt3_13gram"
        ).collect()
    }
    assert rows == {(200, 0): 1}
    with pytest.raises(ValueError, match="unknown preset"):
        dedup.contamination_pairs(corpus, bench, preset="nope")


def test_benchmark_side_broadcasts(spark):
    corpus, bench = _frames(spark)
    buf = io.StringIO()
    with redirect_stdout(buf):
        dedup.contamination_pairs(corpus, bench).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


# -- Bloom-filter decontamination -------------------------------------------


def test_bloom_no_false_negatives_and_counts(spark):
    """Every doc that truly shares a bigram with the benchmark MUST be
    flagged (Bloom filters have no false negatives), and its flagged
    count >= its true shared-gram count."""
    corpus, bench = _frames(spark)
    flagged = {
        r.doc_id: r.n_flagged_grams
        for r in dedup.bloom_contaminated(corpus, bench, n=2).collect()
    }
    exact = {}
    for r in (
        dedup.contamination_pairs(corpus, bench, n=2, min_overlap=1)
        .groupBy("doc_id")
        .agg(F.sum("n_shared_grams").alias("c"))
        .collect()
    ):
        exact[r.doc_id] = r.c
    for doc, c in exact.items():
        assert doc in flagged and flagged[doc] >= 1, doc
    # the verbatim leak shares many grams -> many flagged grams
    assert flagged[100] >= exact[100] - 0  # every shared gram hits
    assert 103 not in flagged  # too short for any bigram


def test_bloom_deterministic_and_filter_shape(spark):
    corpus, bench = _frames(spark)
    a = sorted(map(tuple, dedup.bloom_contaminated(corpus, bench).collect()))
    b = sorted(
        map(
            tuple,
            dedup.bloom_contaminated(corpus.repartition(5), bench).collect(),
        )
    )
    assert a == b
    # the artifact is m_bits/64 words; set-bit count is bounded by k*grams
    bloom = dedup.bloom_filter_build(
        bench.select(F.explode(dedup.ngram_set("text", 2)).alias("gram"))
    )
    assert len(bloom) == 16384 // 64
    setbits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in bloom)
    n_grams = (
        bench.select(F.explode(dedup.ngram_set("text", 2))).distinct().count()
    )
    assert 0 < setbits <= 4 * n_grams
    with pytest.raises(ValueError, match="power of two"):
        dedup.bloom_filter_build(
            bench.select(F.explode(dedup.ngram_set("text", 2)).alias("gram")),
            m_bits=1000,
        )


def test_bloom_position_spec_sync(spark):
    """The Spark-side position derivation (dedup._bloom_positions:
    7-hex slices of one md5) matches the independent Python mirror for
    real grams — the drift detector for the spec both the filter build
    and the oracle SQL are rendered from."""
    import hashlib

    grams = ["the capital", "of france", "a", "multi word gram", "x y"]
    df = spark.createDataFrame([(g,) for g in grams], "gram string")
    rows = df.select(
        "gram", *[p.alias(f"p{i}") for i, p in enumerate(dedup._bloom_positions(F.col("gram"), 16384, 4))]
    ).collect()
    for r in rows:
        h = hashlib.md5(f"bloom:{r.gram}".encode()).hexdigest()
        for i in range(4):
            assert getattr(r, f"p{i}") == int(h[7 * i : 7 * i + 7], 16) % 16384, (r.gram, i)


def test_bloom_position_spec_validation(spark):
    """k bounds are enforced per spec at expression-build time for BOTH
    the build and the probe (second review pass: the xxh64 spec
    accepted k=0/k>63, silently degrading the filter)."""
    import pytest as _pt

    from e_commerce_lakehouse_spark.operators import dedup

    g = spark.createDataFrame([("a",)], "gram string")
    for spec, bad_k in (("md5", 0), ("md5", 5), ("xxh64", 0), ("xxh64", 64)):
        with _pt.raises(ValueError, match="k must be in"):
            dedup.bloom_filter_build(g, m_bits=256, k=bad_k, spec=spec)
        with _pt.raises(ValueError, match="k must be in"):
            dedup.bloom_hit(F.col("gram"), [0] * 4, m_bits=256, k=bad_k, spec=spec)
    # valid xxh64 k up to 63 builds fine
    b = dedup.bloom_filter_build(g, m_bits=256, k=63, spec="xxh64")
    assert g.filter(dedup.bloom_hit(F.col("gram"), b, m_bits=256, k=63, spec="xxh64")).count() == 1
