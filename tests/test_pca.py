"""Distributed PCA: partial-gram training equals the single-pass numpy
reference; projections satisfy the algebra (orthonormal components,
eigen-equation, variance ordering, reconstruction monotonicity)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import pca
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


def _X(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return emb, np.asarray([np.asarray(r.embedding, np.float64) for r in rows])


def test_pca_train_matches_numpy_reference(spark):
    emb, X = _X(spark)
    model = pca.pca_train(emb, k=4)
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    ref = vecs[:, order].T
    for i in range(4):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    got = np.asarray(model["components"])
    assert np.allclose(np.asarray(model["mean"]), mean, atol=1e-9)
    assert np.allclose(got, ref, atol=1e-7)
    assert np.allclose(np.asarray(model["explained_var"]), vals[order], atol=1e-9)
    # invariants: orthonormal, eigen-equation, descending variance
    assert np.allclose(got @ got.T, np.eye(4), atol=1e-9)
    for i, lam in enumerate(model["explained_var"]):
        assert np.allclose(cov @ got[i], lam * got[i], atol=1e-7)
    ev = model["explained_var"]
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    # partitioning independence of the partial-gram reduce
    model8 = pca.pca_train(emb.repartition(8), k=4)
    assert np.allclose(np.asarray(model8["components"]), got, atol=1e-7)


def test_pca_project_and_reconstruction_monotone(spark):
    emb, X = _X(spark)
    mean = X.mean(axis=0)
    errs = []
    for k in (1, 4, 8):
        model = pca.pca_train(emb, k=k)
        out = pca.pca_project(emb, model).select("vec_id", "pca").collect()
        out.sort(key=lambda r: r.vec_id)
        P = np.asarray([r.pca for r in out])
        C = np.asarray(model["components"])
        # projection equals the numpy projection
        assert np.allclose(P, (X - mean) @ C.T, atol=1e-5)
        recon = mean + P @ C
        errs.append(float(((X - recon) ** 2).sum()))
    assert errs[0] >= errs[1] >= errs[2]  # more components, less error
    # plan stays JVM-side
    plan = (
        pca.pca_project(emb, pca.pca_train(emb, k=2))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_pca_guards(spark):
    emb, _ = _X(spark)
    with pytest.raises(ValueError, match="k must be"):
        pca.pca_train(emb, k=0)
    with pytest.raises(ValueError, match="exceeds dimension"):
        pca.pca_train(emb, k=65)
    with pytest.raises(ValueError, match="no vectors"):
        pca.pca_train(emb.filter(F.lit(False)), k=2)
