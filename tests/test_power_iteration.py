"""PCA building blocks (operators/power_iteration.py) pinned against
numpy.linalg.eigh — the eigen-solve q160's docstring promises is
proven here, on a planted-structure fixture where the right answer is
known by construction."""

from __future__ import annotations

import numpy as np
import pytest

from dataingestiontohana_spark.operators.power_iteration import (
    covariance,
    gram_moments,
    project_component,
    top_eigenvector,
)

from tests.conftest import SF0001


def _planted(n=400, d=16, seed=3):
    """Rows = strong direction u * t + weak isotropic noise: the top
    component is u by construction."""
    rng = np.random.default_rng(seed)
    u = rng.standard_normal(d)
    u /= np.linalg.norm(u)
    t = rng.standard_normal(n) * 0.4
    noise = rng.standard_normal((n, d)) * 0.02
    return (np.outer(t, u) + noise).astype(np.float32), u


@pytest.fixture(scope="module")
def planted_df(spark):
    m, u = _planted()
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(m)],
        "vec_id long, embedding array<float>",
    ).coalesce(4)
    return df, m, u


def test_gram_moments_exact_vs_numpy(planted_df):
    df, m, _ = planted_df
    n, sx, sxy = gram_moments(df, dim=16)
    x = m.astype(np.float64) * 1_000_000
    q = np.trunc(x + np.copysign(0.5, x)).astype(np.int64)
    assert n == len(m)
    assert np.array_equal(sx, q.sum(axis=0))
    assert np.array_equal(sxy, q.T @ q)  # EXACT, not approx


def test_covariance_matches_numpy_cov(planted_df):
    df, m, _ = planted_df
    n, sx, sxy = gram_moments(df, dim=16)
    cov = covariance(n, sx, sxy)
    ref = np.cov(m.astype(np.float64), rowvar=False)
    # quantization to the 1e-6 grid bounds the drift far below the
    # signal variance (~0.16)
    assert np.allclose(cov, ref, atol=1e-9)


def test_power_iteration_matches_eigh(planted_df):
    df, m, u = planted_df
    n, sx, sxy = gram_moments(df, dim=16)
    cov = covariance(n, sx, sxy)
    lam, v = top_eigenvector(cov)
    w, vecs = np.linalg.eigh(cov)
    assert lam == pytest.approx(w[-1], rel=1e-10)
    top = vecs[:, -1]
    assert abs(float(np.dot(v, top))) == pytest.approx(1.0, abs=1e-9)
    # and it recovers the PLANTED direction
    assert abs(float(np.dot(v, u))) > 0.999


def test_projection_variance_equals_eigenvalue(planted_df):
    df, m, _ = planted_df
    n, sx, sxy = gram_moments(df, dim=16)
    cov = covariance(n, sx, sxy)
    lam, v = top_eigenvector(cov)
    mean = m.astype(np.float64).mean(axis=0)
    scored = project_component(df, v, center=mean)
    scores = np.array([r["pc1_score"] for r in scored.collect()])
    # variance along the top component IS the top eigenvalue
    assert scores.var(ddof=1) == pytest.approx(lam, rel=1e-6)
    # plan stays map-only: no exchange in the projection
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_real_embeddings_power_iteration(spark):
    from dataingestiontohana_spark.catalog import load_table

    df = load_table(spark, SF0001, "embeddings")
    n, sx, sxy = gram_moments(df, dim=64)
    cov = covariance(n, sx, sxy)
    lam, v = top_eigenvector(cov)
    w, _vecs = np.linalg.eigh(cov)
    # the synthetic corpus is near-isotropic (lambda1/lambda2 ~ 1), so
    # power iteration lands in the top eigen-BAND, not 1e-9 of
    # lambda1 — assert the Rayleigh quotient sits inside [lambda2,
    # lambda1] and the residual is small relative to the spectrum
    assert w[-2] - 1e-12 <= lam <= w[-1] + 1e-12
    resid = np.linalg.norm(cov @ v - lam * v)
    assert resid < 1e-3 * w[-1]
