"""Persisted vector-index artifacts: train once, probe many, admit
deltas — the missing lifecycle around operators/similarity.py's
in-session IVF / PQ / SQ8 builders (which retrain on every call — fine
for an oracle-gated query, wrong for a pipeline owner who trains
nightly and probes per-request).

Every artifact is a SMALL DataFrame persisted as a snapshot-log table
(:mod:`~e_commerce_lakehouse_spark.sources.snapshots`), so index state
gets the same atomic commits, time travel, tags, and expiry as the
data it indexes — a training cut can pin "the index my eval ran
against" with one tag. Layout under the index root:

    <root>/centroids   IVF coarse quantizer    (centroid_id, c_vec)
    <root>/codebooks   PQ per-subspace tables  (sub, cell, c_vec)
    <root>/bounds      SQ8 per-dim min/max     (d, mn, mx)
    <root>/codes       encoded corpus          (kind-specific)

with the params dict in each commit's manifest ``meta`` (atomic with
the rows — a half-written index is unreadable, never half-read).

Delta admission NEVER retrains: new vectors are assigned/encoded under
the FROZEN quantizer and appended to ``codes`` as one append commit —
the `minhash_lsh_incremental` discipline (dedup.py) applied to the
vector tier. Out-of-range values under SQ8's frozen bounds clamp to
the code range, exactly like Faiss's SQ8 with train-time bounds.

Scale shape: quantizer state is KBs-to-MBs (broadcast side of every
probe/encode join); `codes` is the only corpus-sized table and is
written once + appended, never re-shuffled by probes; probes broadcast
the query side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import snapshots
from . import similarity as sim


def _sub(root: str, name: str) -> str:
    import os

    return os.path.join(root, name)


def _meta(root: str, table: str) -> dict:
    m = snapshots._load(_sub(root, table))
    if m["current"] is None:
        raise KeyError(f"no {table} artifact under {root}; train first")
    return snapshots._entry(m, m["current"])["meta"]


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def train_ivf(
    embeddings: DataFrame, root: str, n_centroids: int = 8, iters: int = 2
) -> dict:
    """Train the coarse quantizer (distributed Lloyd — the centroid
    state never rides the driver) and encode the corpus into its
    inverted lists. Commits ``centroids`` then ``codes``; returns the
    snapshot ids."""
    v = sim._kmeans_prep(embeddings).join(
        embeddings.select("vec_id", "label"), "vec_id"
    )
    cent = sim.kmeans_train_distributed(
        v.select("vec_id", "vec"), n_centroids, iters
    )
    meta = {"kind": "ivf", "n_centroids": n_centroids, "iters": iters}
    cid = snapshots.write_snapshot(cent, _sub(root, "centroids"), meta=meta)
    cent = snapshots.read_snapshot(embeddings.sparkSession, _sub(root, "centroids"))
    codes = _ivf_assign(v, cent)
    kid = snapshots.write_snapshot(codes, _sub(root, "codes"), meta=meta)
    return {"centroids_snapshot": cid, "codes_snapshot": kid}


def _ivf_assign(v: DataFrame, cent: DataFrame) -> DataFrame:
    """Cell assignment by COSINE to the broadcast centroids — the same
    rule (ties to the smaller centroid_id) as ``similarity.ivf_topk``,
    so a probe against the persisted lists reproduces it exactly."""
    scored = v.crossJoin(F.broadcast(cent)).withColumn(
        "ccos",
        sim.cosine_q(
            sim.dot_q(F.col("vec"), F.col("c_vec")),
            sim.norm_sq_q(F.col("vec")),
            sim.norm_sq_q(F.col("c_vec")),
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "label", "vec", "centroid_id")
    )


def admit_ivf(new_embeddings: DataFrame, root: str) -> int:
    """Assign NEW vectors under the frozen quantizer and append them to
    the inverted lists — one append commit, the existing corpus is
    never re-read or re-shuffled."""
    spark = new_embeddings.sparkSession
    cent = snapshots.read_snapshot(spark, _sub(root, "centroids"))
    v = sim._kmeans_prep(new_embeddings).join(
        new_embeddings.select("vec_id", "label"), "vec_id"
    )
    return snapshots.write_snapshot(
        _ivf_assign(v, cent), _sub(root, "codes"), mode="append"
    )


def probe_ivf(
    queries: DataFrame, root: str, nprobe: int = 2, k: int = 5
) -> DataFrame:
    """ANN against the persisted index: queries (vec_id, embedding)
    probe their ``nprobe`` cosine-nearest cells and rank exact cosine
    within them — (query_id, neighbor_id, neighbor_label, cosine,
    rank). The probe side broadcasts; the inverted lists shuffle only
    on centroid_id."""
    spark = queries.sparkSession
    cent = snapshots.read_snapshot(spark, _sub(root, "centroids"))
    lists = snapshots.read_snapshot(spark, _sub(root, "codes"))
    q = sim._kmeans_prep(queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("q_vec")
    )
    qscore = q.crossJoin(F.broadcast(cent)).withColumn(
        "ccos",
        sim.cosine_q(
            sim.dot_q(F.col("q_vec"), F.col("c_vec")),
            sim.norm_sq_q(F.col("q_vec")),
            sim.norm_sq_q(F.col("c_vec")),
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qscore.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    pairs = lists.join(F.broadcast(probes), "centroid_id").filter(
        F.col("query_id") != F.col("vec_id")
    )
    out = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        sim.cosine_q(
            sim.dot_q(F.col("q_vec"), F.col("vec")),
            sim.norm_sq_q(F.col("q_vec")),
            sim.norm_sq_q(F.col("vec")),
        ).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# PQ
# ---------------------------------------------------------------------------


def train_pq(
    embeddings: DataFrame, root: str, m: int = 8, ks: int = 16, iters: int = 2
) -> dict:
    """Train the product quantizer and persist codebooks + the encoded
    corpus. Codebooks flatten to (sub, cell, c_vec) rows — m·ks rows
    of dim/m-long arrays, KBs at any corpus size."""
    spark = embeddings.sparkSession
    v = sim._kmeans_prep(embeddings)
    cells, cent = sim._pq_train(v, m, ks, iters)
    rows = [
        (s, int(c), [int(x) for x in cent[s][i]])
        for s in range(m)
        for i, c in enumerate(cells[s])
    ]
    cb = spark.createDataFrame(rows, "sub int, cell long, c_vec array<bigint>")
    meta = {"kind": "pq", "m": m, "ks": ks, "iters": iters}
    cid = snapshots.write_snapshot(cb, _sub(root, "codebooks"), meta=meta)
    codes = _pq_encode(v, cells, cent, m, ks)
    kid = snapshots.write_snapshot(codes, _sub(root, "codes"), meta=meta)
    return {"codebooks_snapshot": cid, "codes_snapshot": kid}


def _pq_encode(v: DataFrame, cells, cent, m: int, ks: int) -> DataFrame:
    codes = sim._pq_codes_udf(m, cells, cent)
    bits = max(1, (ks - 1).bit_length())
    packed = " + ".join(
        f"(element_at(codes, {s + 1}) * {1 << (bits * s)})" for s in range(m)
    )
    return v.select("vec_id", codes("vec").alias("codes")).withColumn(
        "pq_code", F.expr(packed)
    )


def _load_codebooks(spark: SparkSession, root: str):
    meta = _meta(root, "codebooks")
    m, ks = int(meta["m"]), int(meta["ks"])
    rows = (
        snapshots.read_snapshot(spark, _sub(root, "codebooks"))
        .orderBy("sub", "cell")
        .collect()
    )
    cells = [[] for _ in range(m)]
    cent = [[] for _ in range(m)]
    for r in rows:
        cells[r.sub].append(int(r.cell))
        cent[r.sub].append([int(x) for x in r.c_vec])
    return cells, cent, m, ks


def admit_pq(new_embeddings: DataFrame, root: str) -> int:
    """Encode NEW vectors under the frozen codebooks, append to codes."""
    spark = new_embeddings.sparkSession
    cells, cent, m, ks = _load_codebooks(spark, root)
    v = sim._kmeans_prep(new_embeddings)
    return snapshots.write_snapshot(
        _pq_encode(v, cells, cent, m, ks), _sub(root, "codes"), mode="append"
    )


def probe_pq(queries: DataFrame, root: str, k: int = 5) -> DataFrame:
    """ADC scan of the persisted codes: each query builds its m×ks
    lookup table against the loaded codebooks and broadcast-joins the
    code frame — (query_id, neighbor_id, adc_d2, rank), identical
    semantics to ``similarity.pq_index``'s topk surface."""
    from pyspark.sql.functions import pandas_udf

    spark = queries.sparkSession
    cells, cent, m, ks = _load_codebooks(spark, root)
    coded = snapshots.read_snapshot(spark, _sub(root, "codes"))
    cellarrs = [np.asarray(c, dtype=np.int64) for c in cells]
    cents = [np.asarray(c, dtype=np.int64) for c in cent]

    @pandas_udf("array<array<long>>")
    def qtab(vec: pd.Series) -> pd.Series:
        V = np.array(vec.tolist(), dtype=np.int64)
        d0 = V.shape[1] // m
        out = []
        for row in V:
            tabs = []
            for s in range(m):
                t = np.zeros(ks, dtype=np.int64)
                diff = row[s * d0 : (s + 1) * d0][None, :] - cents[s]
                t[cellarrs[s]] = np.einsum("kd,kd->k", diff, diff)
                tabs.append(t.tolist())
            out.append(tabs)
        return pd.Series(out)

    q = sim._kmeans_prep(queries).select(
        F.col("vec_id").alias("query_id"), qtab("vec").alias("qtab")
    )
    scored = (
        coded.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(codes, qtab, (c, t) ->"
                " element_at(t, CAST(c AS INT) + 1)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("adc_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


# ---------------------------------------------------------------------------
# SQ8
# ---------------------------------------------------------------------------


def train_sq8(embeddings: DataFrame, root: str) -> dict:
    """Persist the per-dimension (min, max) train bounds and the
    encoded corpus."""
    spark = embeddings.sparkSession
    v = sim._kmeans_prep(embeddings)
    bounds = (
        v.select(F.posexplode("vec").alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    meta = {"kind": "sq8"}
    bid = snapshots.write_snapshot(bounds, _sub(root, "bounds"), meta=meta)
    mm = _load_bounds(spark, root)
    kid = snapshots.write_snapshot(
        _sq8_encode(v, mm), _sub(root, "codes"), meta=meta
    )
    return {"bounds_snapshot": bid, "codes_snapshot": kid}


def _load_bounds(spark: SparkSession, root: str) -> dict[int, tuple[int, int]]:
    rows = snapshots.read_snapshot(spark, _sub(root, "bounds")).collect()
    return {int(r.d): (int(r.mn), int(r.mx)) for r in rows}


def _sq8_encode(v: DataFrame, mm: dict) -> DataFrame:
    """Encode under FROZEN bounds; values outside them clamp to the
    code range (Faiss SQ8 semantics for post-train data drift)."""
    dim = len(mm)
    code_arr = (
        "array("
        + ", ".join(
            "greatest(0, least(255, "
            + sim.sq8_code_sql(
                f"element_at(vec, {d + 1})", str(mm[d][0]), str(mm[d][1]), "spark"
            )
            + "))"
            for d in range(dim)
        )
        + ")"
    )
    return v.select("vec_id", F.expr(code_arr).alias("sq_codes"))


def admit_sq8(new_embeddings: DataFrame, root: str) -> int:
    spark = new_embeddings.sparkSession
    mm = _load_bounds(spark, root)
    v = sim._kmeans_prep(new_embeddings)
    return snapshots.write_snapshot(
        _sq8_encode(v, mm), _sub(root, "codes"), mode="append"
    )


def probe_sq8(
    queries: DataFrame,
    root: str,
    corpus: DataFrame,
    k: int = 5,
    rerank: int = 4,
) -> DataFrame:
    """ADC scan of the persisted byte codes + exact refine of the
    k·rerank survivors against ``corpus`` (the raw embedding table —
    byte codes alone cannot refine). Same ranking semantics as
    ``similarity.sq8_index``'s topk."""
    spark = queries.sparkSession
    mm = _load_bounds(spark, root)
    codes = snapshots.read_snapshot(spark, _sub(root, "codes"))
    dim = len(mm)
    dequant_arr = (
        "array("
        + ", ".join(
            sim.sq8_dequant_sql(
                f"element_at(sq_codes, {d + 1})", str(mm[d][0]), str(mm[d][1]), "spark"
            )
            for d in range(dim)
        )
        + ")"
    )
    xhat = codes.select("vec_id", F.expr(dequant_arr).alias("xhat"))
    q = sim._kmeans_prep(queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    adc = (
        xhat.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(qvec, xhat, (a, b) -> (a-b)*(a-b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("adc_d2"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    cands = (
        adc.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= k * rerank)
        .drop("_r")
    )
    v = sim._kmeans_prep(corpus)
    exact = (
        v.join(F.broadcast(cands), v["vec_id"] == cands["neighbor_id"])
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_d2",
            F.expr(
                "aggregate(zip_with(qvec, vec, (a, b) -> (a-b)*(a-b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("sq_d2"),
        )
    )
    w_fin = Window.partitionBy("query_id").orderBy(
        F.col("sq_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_fin))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_d2", "sq_d2", "rank")
    )


def delete_vectors(spark: SparkSession, root: str, vec_ids: list) -> int:
    """Remove vectors from a persisted index WITHOUT re-encoding or
    rewriting the inverted lists — the right-to-be-forgotten request
    against the vector tier. The ``codes`` table is a snapshot table,
    so this is one deletion-vector commit
    (:func:`~e_commerce_lakehouse_spark.sources.deletes.delete_where_dv`):
    O(deleted positions) bytes written, every codes file byte-identical,
    and every probe path (which reads through ``read_snapshot``)
    excludes the vectors immediately. Compaction is the standard
    ``rewrite_deletes`` on the codes table when the DV stack grows."""
    from ..sources import deletes

    return deletes.delete_where_dv(
        spark, _sub(root, "codes"), [("vec_id", "in", list(vec_ids))]
    )
