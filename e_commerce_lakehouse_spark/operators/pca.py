"""Distributed PCA over an embedding column.

The dimensionality-reduction step an embedding pipeline runs before
indexing (and the whitening step before cosine thresholds transfer
across models): project d-dim vectors onto the top-k principal
components of the corpus.

Scale shape — the textbook two-phase covariance PCA:

1. TRAIN: each Arrow batch reduces to (count, sum_d, gram_{dxd}) via
   one numpy ``X.T @ X`` — only d(d+1)/2-ish scalars per PARTITION
   cross the wire (d=64 → a few KB), never rows. The driver assembles
   the covariance and runs ``numpy.linalg.eigh`` (a dxd symmetric
   eigensolve — microseconds; the only non-distributed step, and the
   one every production system centralizes: d is model-fixed, not
   data-sized). Eigenvector SIGNS are fixed deterministically (largest
   |component| made positive) so retrainings are reproducible.

2. PROJECT: components ride the closure as literals; the projection is
   pure Column math (``aggregate`` over zip_with products per
   component — JVM-side, codegen), no Python in the hot path.

Float caveat (same stance as similarity.py's quantization): training
sums are exact over float64 partials in a FIXED reduce order only per
partition; cross-partition addition order is nondeterministic, so
trained components can differ between runs in the last ulps. Training
is therefore an ARTIFACT-producing step (train once, persist, reuse) —
not an oracle-gated query. Tests pin exact equality against a
single-pass numpy reference on repartition-stable inputs plus the
algebraic invariants (orthonormality, eigen-equation residual,
variance ordering, reconstruction-error monotonicity).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pca_train(
    embeddings: DataFrame, k: int, vec_col: str = "embedding"
) -> dict:
    """Fit top-``k`` principal components. Returns the artifact dict
    ``{"mean": [d], "components": [k][d], "explained_var": [k]}``
    (plain lists — JSON/parquet-persistable like the BPE merge
    table)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            yield pd.DataFrame(
                {
                    "n": [int(X.shape[0])],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).reshape(-1).tolist()],
                }
            )

    rows = (
        embeddings.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(
            partials, schema="n long, s array<double>, g array<double>"
        )
        .collect()
    )
    if not rows:
        raise ValueError("no vectors to train on")
    d = len(rows[0]["s"])
    if k > d:
        raise ValueError(f"k={k} exceeds dimension d={d}")
    n = sum(r["n"] for r in rows)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    # deterministic sign: the largest-|entry| coordinate is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_var": vals[order].tolist(),
    }


def _dot_lit(vec: Column, w: list[float]) -> Column:
    lit = F.lit([float(x) for x in w])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(
    df: DataFrame, model: dict, vec_col: str = "embedding", out_col: str = "pca"
) -> DataFrame:
    """Append ``out_col`` = the centered projection onto the trained
    components, as ``array<double>`` of length k. Pure Column math
    (one fused expression per component) — map-only, codegen, no
    Python."""
    mean = model["mean"]
    comps = model["components"]
    centered_dots = [
        _dot_lit(F.col(vec_col), c)
        - F.lit(float(np.dot(mean, c)))
        for c in comps
    ]
    return df.withColumn(out_col, F.array(*centered_dots))
