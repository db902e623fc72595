"""Distributed PCA (operators/pca.py) vs NumPy ground truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cli_rag_spark.operators.pca import (
    covariance_matrix,
    pca_fit,
    pca_project,
)
from cli_rag_spark.sources.documents import load_table

DIM = 64


@pytest.fixture(scope="module")
def emb_np(spark, sf_smoke_dir):
    df = load_table(spark, sf_smoke_dir, "embeddings").orderBy("vec_id")
    x = np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64) for r in df.collect()]
    )
    return x


def test_covariance_matches_numpy(spark, sf_smoke_dir, emb_np):
    df = load_table(spark, sf_smoke_dir, "embeddings").repartition(4)
    cov, mean, n = covariance_matrix(df, "embedding", DIM)
    assert n == emb_np.shape[0]
    np.testing.assert_allclose(mean, emb_np.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(emb_np, rowvar=False), atol=1e-9)


def test_fit_components_orthonormal_and_ordered(spark, sf_smoke_dir, emb_np):
    df = load_table(spark, sf_smoke_dir, "embeddings")
    model = pca_fit(df, "embedding", DIM, k=6)
    w = np.asarray(model["components"])
    np.testing.assert_allclose(w @ w.T, np.eye(6), atol=1e-8)
    ev = model["eigenvalues"]
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    # sign convention: the largest-|weight| coordinate is positive
    for row in w:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # eigenvalues match numpy's (sorted desc)
    ref = np.sort(np.linalg.eigvalsh(np.cov(emb_np, rowvar=False)))[::-1][:6]
    np.testing.assert_allclose(ev, ref, atol=1e-8)


def test_project_matches_numpy_and_variance(spark, sf_smoke_dir, emb_np):
    df = load_table(spark, sf_smoke_dir, "embeddings")
    model = pca_fit(df, "embedding", DIM, k=4)
    out = pca_project(df, "embedding", model, out_col="pc").orderBy("vec_id")
    got = np.asarray([r["pc"] for r in out.select("pc").collect()])
    w = np.asarray(model["components"])
    ref = (emb_np - np.asarray(model["mean"])) @ w.T
    np.testing.assert_allclose(got, ref, atol=1e-8)
    # per-component projected variance == eigenvalue (PCA's defining property)
    np.testing.assert_allclose(
        got.var(axis=0, ddof=1), model["eigenvalues"], rtol=1e-6
    )


def test_projection_is_pure_map(spark, sf_smoke_dir):
    """The projection plan must contain no Exchange and no Python eval
    — components enter as literals, so it is one codegen'd map."""
    df = load_table(spark, sf_smoke_dir, "embeddings")
    model = pca_fit(df, "embedding", DIM, k=2)
    plan = (
        pca_project(df, "embedding", model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_fit_validates_k(spark, sf_smoke_dir):
    df = load_table(spark, sf_smoke_dir, "embeddings")
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(df, "embedding", DIM, k=0)


def test_covariance_rejects_tiny_input(spark, sf_smoke_dir):
    df = load_table(spark, sf_smoke_dir, "embeddings").limit(1)
    with pytest.raises(ValueError, match=">= 2 rows"):
        covariance_matrix(df, "embedding", DIM)
