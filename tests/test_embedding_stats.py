"""PCA / covariance over embeddings: the scale-shape (gram partials) agrees
with the oracle-anchored exact shape, and the PCA model obeys its algebraic
invariants deterministically."""

from __future__ import annotations

import numpy as np
import pytest

from etl_cloud_logistics_spark.catalog import load_table
from etl_cloud_logistics_spark.operators.embedding_stats import (
    covariance_long,
    fit_pca,
    gram_partials,
    moments_from_partials,
    pca_model,
    pca_project,
)

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings")


@pytest.fixture(scope="module")
def moments(spark, emb):
    return moments_from_partials(gram_partials(emb, "embedding", DIM), DIM)


def test_gram_partials_match_exact_covariance(spark, emb, moments):
    """The one-pass constant-state scale shape reproduces the decimal-exact
    self-join shape to float-merge tolerance."""
    n, mean, cov = moments
    exact = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in covariance_long(emb, "embedding", "vec_id").collect()
    }
    assert n == emb.count()
    scale = max(abs(v) for v in exact.values())
    for (i, j), v in exact.items():
        assert abs(cov[i - 1, j - 1] - v) < 1e-9 * max(1.0, scale), (i, j)


def test_partial_state_is_partition_bounded(spark, emb):
    """Partials row count ≤ partition count — the 100 TB contract: state
    never proportional to rows."""
    parts = gram_partials(emb, "embedding", DIM)
    assert parts.count() <= emb.rdd.getNumPartitions()


def test_pca_model_invariants(moments):
    n, mean, cov = moments
    comps, evals, _ = pca_model(cov, mean, k=8)
    # eigenvalues sorted descending, all ≥ ~0 (covariance is PSD)
    assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(7))
    assert evals[-1] > -1e-9
    # orthonormal rows
    g = comps @ comps.T
    assert np.allclose(g, np.eye(8), atol=1e-9)
    # sign convention: largest-|entry| of each component is positive
    for v in comps:
        assert v[int(np.argmax(np.abs(v)))] > 0


def test_pca_model_deterministic(moments):
    n, mean, cov = moments
    a_c, a_e, _ = pca_model(cov, mean, k=4)
    b_c, b_e, _ = pca_model(cov.copy(), mean.copy(), k=4)
    assert np.array_equal(a_c, b_c) and np.array_equal(a_e, b_e)


def test_projection_variance_matches_eigenvalues(spark, emb, moments):
    """Population variance of each projected score == its eigenvalue — the
    defining property of PCA, verified through the distributed projection
    path (codegen-unrolled expressions, no Python per row)."""
    n, mean, cov = moments
    comps, evals, mean = pca_model(cov, mean, k=2)
    rows = pca_project(emb, "embedding", comps, mean).select("pc1", "pc2").collect()
    x = np.asarray([[r["pc1"], r["pc2"]] for r in rows])
    var = x.var(axis=0)  # population
    assert np.allclose(var, evals[:2], rtol=1e-6)
    # top component captures at least as much variance as any raw dimension
    assert evals[0] >= np.diag(cov).max() - 1e-12


def test_reconstruction_error_decreases_with_k(spark, emb, moments):
    n, mean, cov = moments
    total_var = float(np.trace(cov))
    errs = []
    for k in (2, 8, 32):
        comps, evals, _ = pca_model(cov, mean, k=k)
        errs.append(total_var - float(evals.sum()))
    assert errs[0] > errs[1] > errs[2] >= -1e-9


def test_fit_pca_end_to_end_deterministic(spark, emb):
    c1, e1, m1, n1 = fit_pca(emb, "embedding", DIM, k=2)
    c2, e2, m2, n2 = fit_pca(emb, "embedding", DIM, k=2)
    assert n1 == n2 and np.array_equal(c1, c2) and np.array_equal(m1, m2)
