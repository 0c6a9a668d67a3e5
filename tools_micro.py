#!/usr/bin/env python
"""Ad-hoc micro-bench: time named sub-frames of the declared queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] with the noop sink —
the guide §1.4 methodology, at operator granularity. Round-12 tooling
only; results land in stdout, one line per target: name reps=... min=...

Usage: python tools_micro.py <target> [<target> ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from e_commerce_lakehouse_spark.operators import corpus_cache  # noqa: E402
from e_commerce_lakehouse_spark.operators.parallelize import (  # noqa: E402
    _persistent_rdd_ids,
    release_rdds,
)
from e_commerce_lakehouse_spark.session import build_session  # noqa: E402
from e_commerce_lakehouse_spark.sources.parquet import load_table  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("MICRO_RUNS", "3"))
    spark = build_session(
        app_name="micro", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from e_commerce_lakehouse_spark.operators import (  # noqa: E402
        aggregates as agg,
        classifier as classifier_ops,
        dedup,
        dictionary,
        pii,
        quality,
        sampling,
        similarity,
        sketches as sketch_ops,
        suffix as suffix_ops,
        text,
    )

    docs = lambda: load_table(spark, sf, "documents")  # noqa: E731
    emb = lambda: load_table(spark, sf, "embeddings")  # noqa: E731
    li = lambda: load_table(spark, sf, "lineitem")  # noqa: E731

    targets: dict[str, object] = {
        # q18 decomposition
        "q18_rep": lambda: suffix_ops.repeated_prefix_lengths(docs(), rounds=5),
        "q18_full": lambda: em.queries()["q18_doc_fingerprints"](spark, sf),
        # q15 decomposition
        "q15_exact": lambda: dedup.exact_dedup(docs()),
        "q15_span": lambda: dedup.span_dedup(docs(), span_tokens=10),
        "q15_substr": lambda: dedup.substring_dup_stats(docs(), win=20),
        # q37 decomposition
        "q37_pii": lambda: pii.pii_report(docs()),
        "q37_dict": lambda: dictionary.dictionary_phrase_stats(
            docs(), em.DICT_PHRASES
        ),
        "q37_rules": lambda: quality.dq_report(
            li(),
            [
                quality.not_null("l_orderkey"),
                quality.positive("l_quantity"),
                quality.in_range("l_discount", 0.0, 0.1),
                quality.not_null("l_shipdate"),
                quality.matches("l_returnflag", "^[ANR]$", "returnflag_valid"),
            ],
        ),
        # q16 decomposition
        "q16_profile": lambda: text.doc_profile(docs()),
        "q16_ql": lambda: classifier_ops.spec_margins(
            classifier_ops.hashed_features(docs(), dim=512)
        ),
        # q39 decomposition
        "q39_ivf": lambda: similarity.ivf_topk(emb()),
        "q39_pq": lambda: similarity.pq_index(
            emb(), prep=em._shared_vec_prep(spark, sf)
        )[0],
        "q39_sq8": lambda: similarity.sq8_index(
            emb(), prep=em._shared_vec_prep(spark, sf)
        )[0],
        # q46 decomposition
        "q46_ann": lambda: similarity.ann_topk_multi(
            emb(), query_max_id=10, k=5, planes=8, tables=3
        ),
        "q46_exact": lambda: similarity.cosine_topk(emb(), query_max_id=10, k=5),
        "q46_hneg": lambda: similarity.hard_negatives(emb(), query_max_id=10, k=5),
        "q46_rrf": lambda: similarity.hybrid_rrf_topk(
            docs(), emb(), query_max_id=10, k=5, pool=20
        ),
        # q33 decomposition
        "q33_full": lambda: em.queries()["q33_approx_sketches"](spark, sf),
        "q34_full": lambda: em.queries()["q34_stratified_sample"](spark, sf),
        # round-13 targets. Driver-side-only stages (Lloyd training)
        # return a 1-row frame so the force() harness fits; the timed
        # region is the eager collect loop itself.
        "q39_train": lambda: (
            similarity._pq_train(em._shared_vec_prep(spark, sf), 8, 16, 2),
            spark.range(1),
        )[1],
        "q39_full": lambda: em.queries()["q39_ivf_ann"](spark, sf),
        "q45_train": lambda: (
            similarity._kmeans_train(em._shared_vec_prep(spark, sf), 8, 2),
            spark.range(1),
        )[1],
        "q45_full": lambda: em.queries()["q45_kmeans_cells"](spark, sf),
        "q43_full": lambda: em.queries()["q43_jaccard_clusters"](spark, sf),
        "q47_full": lambda: em.queries()["q47_pagerank"](spark, sf),
        "q46_full": lambda: em.queries()["q46_ann_multiprobe"](spark, sf),
        "q01_full": lambda: em.queries()["q01_sales_summary"](spark, sf),
        "q08_full": lambda: em.queries()["q08_urgent_lineitems"](spark, sf),
        "q09_full": lambda: em.queries()["q09_customer_segments"](spark, sf),
        "q37_full": lambda: em.queries()["q37_dq_report"](spark, sf),
        "media_aud": lambda: __import__(
            "e_commerce_lakehouse_spark.operators.multimodal", fromlist=["x"]
        ).synthesize_media(docs(), "audio"),
        "media_img": lambda: __import__(
            "e_commerce_lakehouse_spark.operators.multimodal", fromlist=["x"]
        ).synthesize_media(docs(), "image"),
        "media_vid": lambda: __import__(
            "e_commerce_lakehouse_spark.operators.multimodal", fromlist=["x"]
        ).synthesize_media(docs(), "video"),
    }

    names = sys.argv[1:] or list(targets)
    # warm the session the way bench.py does (codegen + Arrow pool)
    try:
        force(em.queries()["q04_monthly_sales_mom"](spark, sf))
    except Exception:
        pass
    for name in names:
        fn = targets[name]
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"micro:{name}")
            t0 = time.perf_counter()
            force(fn())
            ts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            release_rdds(
                spark,
                _persistent_rdd_ids(spark) - corpus_cache.cached_rdd_ids(spark),
            )
        print(f"{name} reps={ts} min={min(ts)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
