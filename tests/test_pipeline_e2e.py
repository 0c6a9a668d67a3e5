"""End-to-end training-data pipeline composition: the operators are
built to CHAIN — quality gate → exact dedup → duplicate-span removal →
near-dup cluster drop → source mixing → BPE tokenize → sequence pack →
deterministic shuffle — and this test runs the whole chain on real
testdata, asserting the cross-stage invariants a pipeline owner relies
on (monotone survivor counts, token conservation into packing, the
shuffle being a permutation of exactly the survivors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import bpe, dedup, sampling, text
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_training_pipeline_end_to_end(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    n0 = docs.count()

    # 1. quality gate (keep docs with a usable token range)
    profiled = text.text_stats(docs).filter(
        (F.col("n_tokens") >= 3) & (F.col("n_tokens") <= 10_000)
    )
    kept_ids = profiled.select("doc_id")
    stage1 = docs.join(kept_ids, "doc_id", "left_semi")
    n1 = stage1.count()
    assert 0 < n1 <= n0

    # 2. exact dedup: keep each fingerprint's canonical doc
    canon = dedup.exact_dedup(stage1).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    stage2 = stage1.join(canon, "doc_id", "left_semi")
    n2 = stage2.count()
    assert 0 < n2 <= n1

    # 3. near-dup clusters (token-set Jaccard >= 30%): drop non-canonical
    #    members; survivors shrink or hold
    pairs = dedup.ngram_jaccard_pairs(stage2, probe_max_doc_id=50, threshold_pct=30)
    stage3 = dedup.dedup_by_clusters(stage2, pairs)
    n3 = stage3.count()
    assert 0 < n3 <= n2

    # 4. source mixing: derive acceptance rates, downsample by them
    rates = sampling.mixture_rates(stage3, {"src0": 5, "src1": 3})
    with_rate = stage3.join(rates.select("source", "rate_pct"), "source")
    stage4 = sampling.importance_sample(
        with_rate, key="doc_id", weight_pct=F.col("rate_pct")
    )
    n4 = stage4.count()
    assert 0 < n4 <= n3
    # the weight-richest source keeps 100%
    top_src = (
        rates.orderBy(F.desc("rate_pct"), "source").first()
    )
    assert top_src.rate_pct == 100

    # 5. BPE: train on survivors, tokenize survivors
    merges, _ = bpe.train_bpe(stage4, num_merges=8)
    encoded = bpe.bpe_encode(stage4, merges)
    assert encoded.count() == n4
    # tokenization conserves words and never expands past chars+markers
    bad = encoded.filter(
        (F.col("n_symbols") < F.col("n_words")) | F.col("n_symbols").isNull()
    ).count()
    assert bad == 0

    # 6. pack the ENCODED stream: bins cover exactly the total symbols
    packed = sampling.pack_sequences(
        encoded.join(stage4.select("doc_id", "source"), "doc_id")
        .withColumn("text", F.col("bpe_text"))
        .select("doc_id", "source", "text"),
        ctx_len=128,
    )
    tot_sym = encoded.agg(F.sum("n_symbols")).first()[0]
    tot_packed = packed.agg(F.sum("n_tokens")).first()[0]
    assert tot_packed == tot_sym
    # last-doc end position per source == source token total (no gaps)
    per_src = packed.groupBy("source").agg(
        F.max(F.col("bin_id") * 128 + F.col("bin_offset") + F.col("n_tokens")).alias(
            "end"
        ),
        F.sum("n_tokens").alias("tot"),
    )
    assert per_src.filter(F.col("end") != F.col("tot")).count() == 0

    # 7. deterministic shuffle over the final corpus: exact permutation
    shuffled = sampling.shuffle_positions(stage4, key="doc_id")
    pos = [r.shuffle_pos for r in shuffled.select("shuffle_pos").collect()]
    assert sorted(pos) == list(range(n4))
