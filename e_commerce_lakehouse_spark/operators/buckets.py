"""Bounded bucket-mate pairing for LSH blocking (MinHash bands,
sign-LSH bands, SimHash byte-bands — any "same key => candidate pair"
scheme).

The naive plan — ``groupBy(bucket).agg(collect_list(id))`` + double
explode — is correct but has a 100 TB failure mode: a DEGENERATE bucket.
Web-scale corpora are full of boilerplate (empty pages, licence
headers, templated listings) whose members collide on EVERY band, so
one bucket holds the entire duplicate class; the collect_list then
materializes O(n) ids in a single task and the explode emits O(n²)
candidates. At a 10 M-row duplicate class that is one 10 M-element
array in one task and 10¹⁴ candidate rows — an OOM and a quadratic
blowup, not a slow query.

``bucket_mate_pairs`` keeps the cheap plan for normal buckets and
switches strategy per-bucket once size exceeds ``hot_cap``:

  small bucket (2..hot_cap rows)
      exact all-pairs via collect_list + double explode. Per-task
      memory is bounded by ``hot_cap`` elements by construction.

  hot bucket (> hot_cap rows), ``hot_mode="star"`` (default)
      connectivity-preserving STAR pairing: every member pairs with
      the bucket's minimum id — O(n) candidates instead of O(n²).
      Downstream exact verification still filters false positives, and
      connected-components clustering sees the SAME components (a star
      spans the bucket), so dedup semantics survive. What is lost is
      only the exhaustive within-bucket pair list — which for a
      degenerate bucket is exactly the output nobody can afford.

  hot bucket, ``hot_mode="grid"``
      EXACT all-pairs, still task-bounded: the bucket is split into
      ``ceil(n / hot_cap)`` deterministic cells by id-hash, the left
      side replicates across cells, and the pair (a, b) is emitted in
      cell(b) only. Every join group holds ≤ hot_cap build rows, so no
      task ever materializes the whole bucket; the O(n²) OUTPUT remains
      (that is what "exact" means) but it streams across the cluster
      instead of exploding in one task. Use when the caller genuinely
      needs every pair of a hot bucket and accepts the output volume.

Neither mode truncates silently: ``bucket_overflow_stats`` reports
every over-cap bucket (key, size, pairs emitted vs pairs suppressed) so
pipelines can log/account the degenerate classes — at 100 TB those
rows ARE the interesting dedup report.

The input frame is localCheckpoint-materialized first: pairing
references it several times (stats + small path + hot path) and the
upstream is typically an Arrow-batched signature kernel that must not
re-run per reference (see tests/test_plans.py::
test_arrow_kernels_evaluate_once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HOT_CAP = 1024


def _bucket_stats(banded: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """One row per bucket with ≥2 members: size + min id. Partial-agg
    (map-side combine) safe — the agg itself cannot skew."""
    return (
        banded.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_bsz"), F.min(id_col).alias("_bmin"))
        .filter(F.col("_bsz") > 1)
    )


def bucket_mate_pairs(
    banded: DataFrame,
    key_cols: list[str],
    id_col: str,
    hot_cap: int = DEFAULT_HOT_CAP,
    hot_mode: str = "star",
) -> DataFrame:
    """All candidate pairs (a, b), a < b, of rows sharing a bucket key,
    with per-task memory bounded by ``hot_cap`` regardless of bucket
    size (see module docstring for the small/star/grid strategies).

    Returns columns ``(a, b)``; callers typically ``.distinct()`` the
    result because the same pair can surface from several bands.
    """
    if hot_mode not in ("star", "grid"):
        raise ValueError(f"hot_mode must be star|grid, got {hot_mode!r}")
    # Materialize: referenced by the stats agg AND the pairing paths —
    # without this the upstream signature kernel would re-run per
    # reference. The checkpointed frame is the banded index (ids +
    # small keys), the cluster-scale analog of a persisted LSH index.
    banded = banded.localCheckpoint()
    stats = _bucket_stats(banded, key_cols, id_col)
    # join (not window) so no task ever buffers a whole hot bucket:
    # the build side contributes exactly one stats row per key
    keyed = banded.join(stats, key_cols)

    small = keyed.filter(F.col("_bsz") <= hot_cap)
    # exchange reuse: keyed is already hash-partitioned on key_cols by
    # the join above, so this groupBy does not add a shuffle
    small_pairs = (
        small.groupBy(*key_cols)
        .agg(F.collect_list(id_col).alias("_ids"))
        .select(F.explode("_ids").alias("a"), "_ids")
        .select("a", F.explode("_ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
    )

    hot = keyed.filter(F.col("_bsz") > hot_cap)
    if hot_mode == "star":
        # star spans the bucket: O(n) candidates, same connected
        # components as all-pairs; _bmin < id always, so a < b holds
        hot_pairs = hot.filter(F.col(id_col) != F.col("_bmin")).select(
            F.col("_bmin").alias("a"), F.col(id_col).alias("b")
        )
    else:
        ncell = F.ceil(F.col("_bsz") / F.lit(hot_cap)).cast("int")
        # pair (a, b) is emitted in cell(b): the build (right) side of
        # each (bucket, cell) join group holds ≤ hot_cap rows
        right = hot.select(
            *key_cols,
            F.col(id_col).alias("b"),
            F.pmod(F.xxhash64(F.col(id_col)), ncell).cast("int").alias("_cell"),
        )
        left = hot.select(
            *key_cols,
            F.col(id_col).alias("a"),
            F.explode(F.sequence(F.lit(0), ncell - 1)).alias("_cell"),
        )
        hot_pairs = (
            left.join(right, [*key_cols, "_cell"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
        )
    return small_pairs.select("a", "b").unionByName(hot_pairs)


def bucket_overflow_stats(
    banded: DataFrame,
    key_cols: list[str],
    id_col: str,
    hot_cap: int = DEFAULT_HOT_CAP,
    hot_mode: str = "star",
) -> DataFrame:
    """Accounting for the over-cap buckets — the explicit "what was not
    exhaustively paired" report (no silent truncation): one row per hot
    bucket with its size, the candidate pairs the chosen mode emits,
    and the all-pairs count a small bucket would have produced."""
    all_pairs = (F.col("_bsz") * (F.col("_bsz") - 1) / 2).cast("long")
    emitted = (
        (F.col("_bsz") - 1).cast("long") if hot_mode == "star" else all_pairs
    )
    return (
        _bucket_stats(banded, key_cols, id_col)
        .filter(F.col("_bsz") > hot_cap)
        .select(
            *key_cols,
            F.col("_bsz").alias("bucket_size"),
            emitted.alias("pairs_emitted"),
            (all_pairs - emitted).alias("pairs_suppressed"),
        )
    )
