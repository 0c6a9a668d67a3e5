"""Similarity search over embedding columns (array<float>).

Two tiers:
  - brute-force cosine top-k: exact baseline, O(Q·N) — fine when the
    query set is bounded (probe queries, eval sets).
  - LSH-bucketed (random hyperplane sign) variant: the 100 TB scale
    path — candidates only within matching sign-sketch buckets.

Determinism: embeddings are quantized to integer micro-units
(floor(x·1e6 + 0.5)) before any arithmetic, so dot products and norms
are exact BIGINTs; the final cosine is one fixed-order double
expression — bit-identical across engines, shuffle orders, and reruns.

All vector math is built-in array functions (transform / zip_with /
aggregate) — JVM-side, no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000  # micro-unit quantization for exact integer vector math


def quantized(col: Column | str) -> Column:
    """array<float> → array<long> micro-units: floor(x*1e6 + 0.5).
    float→double widening is exact; the floor grid is engine-portable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * F.lit(float(QUANT)) + F.lit(0.5)).cast("long")
    )


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors. Integer adds
    are associative — order never matters."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(dot: Column, norm_sq_a: Column, norm_sq_b: Column) -> Column:
    """cos = dot / (sqrt(|a|²) * sqrt(|b|²)) — one fixed-order double
    expression over exact integers."""
    return dot.cast("double") / (
        F.sqrt(norm_sq_a.cast("double")) * F.sqrt(norm_sq_b.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector (vec_id <
    query_max_id) over the whole corpus.

    Plan: quantize both sides (map), broadcast the probe set, compute
    exact integer dot/norms per pair, rank per query with a window.
    At 100 TB the corpus side streams through executors once; only the
    (small) probe set is broadcast. Ties broken by neighbor id.
    """
    q = embeddings.filter(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("query_id"), quantized("embedding").alias("q_vec")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        quantized("embedding").alias("c_vec"),
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        cosine_q(
            dot_q(F.col("q_vec"), F.col("c_vec")),
            norm_sq_q(F.col("q_vec")),
            norm_sq_q(F.col("c_vec")),
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine", "rank")
    )


def hyperplane_sketch(embeddings: DataFrame, planes: int = 16, seed: int = 7) -> DataFrame:
    """Random-hyperplane sign sketch (SimHash-for-vectors): bit i is the
    sign of <v, h_i> where h_i is a deterministic ±1 hyperplane derived
    from md5(seed, i, dim). Rows with equal sketches are ANN candidates.

    The hyperplanes are materialized as literal arrays (planes × dim is
    tiny); the sketch is `planes` fixed-order integer dot signs packed
    into one BIGINT — a pure map, shuffle-free.
    """
    import hashlib

    # deterministic ±1 hyperplanes — derived off-plan, shipped as literals
    dim = len(embeddings.select("embedding").first()[0])
    planes_arr = []
    for p in range(planes):
        signs = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            signs.append(1 if int(h[:8], 16) % 2 == 0 else -1)
        planes_arr.append(signs)

    qv = quantized("embedding")
    bits = []
    for p, signs in enumerate(planes_arr):
        plane = F.array(*[F.lit(s) for s in signs])
        proj = dot_q(qv, plane.cast("array<long>"))
        bits.append(F.when(proj > 0, F.lit(1).cast("long") * (1 << p)).otherwise(F.lit(0).cast("long")))
    sketch = bits[0]
    for b in bits[1:]:
        sketch = sketch + b
    return embeddings.select("vec_id", "label", sketch.alias("sketch"))


def ann_topk_lsh(
    embeddings: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to equal-sketch buckets,
    then exact cosine rank within the bucket. Recall trades off with
    ``planes``; at scale, multiple sketch tables (OR-amplification)
    raise recall — this is the single-table baseline."""
    sk = hyperplane_sketch(embeddings, planes)
    vec = embeddings.select("vec_id", quantized("embedding").alias("vec"))
    side = sk.join(vec, "vec_id")
    q = side.filter(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("query_id"),
        F.col("sketch").alias("q_sketch"),
        F.col("vec").alias("q_vec"),
    )
    c = side.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("sketch").alias("c_sketch"),
        F.col("vec").alias("c_vec"),
    )
    pairs = c.join(
        F.broadcast(q),
        (F.col("q_sketch") == F.col("c_sketch")) & (F.col("query_id") != F.col("neighbor_id")),
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        cosine_q(
            dot_q(F.col("q_vec"), F.col("c_vec")),
            norm_sq_q(F.col("q_vec")),
            norm_sq_q(F.col("c_vec")),
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine", "rank")
    )
