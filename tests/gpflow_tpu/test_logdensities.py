"""Log-density oracles vs scipy.stats (pattern from reference
``tests/gpflow/test_logdensities.py``)."""
import numpy as np
import pytest
from scipy import stats

from gpflow_tpu import logdensities as ld

rng = np.random.RandomState(5)
N = 20


def test_gaussian():
    x, mu, var = rng.randn(N), rng.randn(N), np.abs(rng.randn(N)) + 0.3
    np.testing.assert_allclose(
        np.asarray(ld.gaussian(x, mu, var)),
        stats.norm.logpdf(x, mu, np.sqrt(var)),
        atol=1e-10,
    )


def test_lognormal():
    x = np.abs(rng.randn(N)) + 0.1
    mu, var = rng.randn(N), np.abs(rng.randn(N)) + 0.3
    np.testing.assert_allclose(
        np.asarray(ld.lognormal(x, mu, var)),
        stats.lognorm.logpdf(x, s=np.sqrt(var), scale=np.exp(mu)),
        atol=1e-10,
    )


def test_bernoulli():
    x = (rng.rand(N) > 0.5).astype(float)
    p = rng.rand(N) * 0.9 + 0.05
    np.testing.assert_allclose(
        np.asarray(ld.bernoulli(x, p)), stats.bernoulli.logpmf(x, p), atol=1e-10
    )


def test_poisson():
    x = rng.poisson(3.0, N).astype(float)
    lam = np.abs(rng.randn(N)) + 0.5
    np.testing.assert_allclose(
        np.asarray(ld.poisson(x, lam)), stats.poisson.logpmf(x, lam), atol=1e-9
    )


def test_exponential():
    x = np.abs(rng.randn(N)) + 0.1
    scale = np.abs(rng.randn(N)) + 0.5
    np.testing.assert_allclose(
        np.asarray(ld.exponential(x, scale)),
        stats.expon.logpdf(x, scale=scale),
        atol=1e-10,
    )


def test_gamma():
    x = np.abs(rng.randn(N)) + 0.1
    shape = np.abs(rng.randn(N)) + 0.5
    scale = np.abs(rng.randn(N)) + 0.5
    np.testing.assert_allclose(
        np.asarray(ld.gamma(x, shape, scale)),
        stats.gamma.logpdf(x, shape, scale=scale),
        atol=1e-9,
    )


def test_student_t():
    x, mean = rng.randn(N), rng.randn(N)
    scale = np.abs(rng.randn(N)) + 0.3
    df = 4.0
    np.testing.assert_allclose(
        np.asarray(ld.student_t(x, mean, scale, df)),
        stats.t.logpdf(x, df, loc=mean, scale=scale),
        atol=1e-9,
    )


def test_beta():
    x = rng.rand(N) * 0.9 + 0.05
    alpha = np.abs(rng.randn(N)) + 0.5
    bet = np.abs(rng.randn(N)) + 0.5
    np.testing.assert_allclose(
        np.asarray(ld.beta(x, alpha, bet)), stats.beta.logpdf(x, alpha, bet), atol=1e-9
    )


def test_laplace():
    x, mu = rng.randn(N), rng.randn(N)
    sigma = np.abs(rng.randn(N)) + 0.3
    np.testing.assert_allclose(
        np.asarray(ld.laplace(x, mu, sigma)),
        stats.laplace.logpdf(x, mu, sigma),
        atol=1e-10,
    )


@pytest.mark.parametrize("d", [1, 3])
def test_multivariate_normal(d):
    # column-convention: x [D, N], mu [D, N], L lower Cholesky of cov [D, D]
    n = 5
    A = rng.randn(d, d)
    cov = A @ A.T + d * np.eye(d)
    L = np.linalg.cholesky(cov)
    x = rng.randn(d, n)
    mu = rng.randn(d, n)
    ours = np.asarray(ld.multivariate_normal(x, mu, L))
    expected = np.array(
        [stats.multivariate_normal.logpdf(x[:, i], mu[:, i], cov) for i in range(n)]
    )
    np.testing.assert_allclose(ours, expected, atol=1e-9)
