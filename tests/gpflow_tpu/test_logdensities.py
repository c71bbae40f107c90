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


@pytest.mark.parametrize("seed", range(10))
def test_logdensities_random_parameters_vs_scipy(seed):
    """Fuzz every density across random parameter draws against scipy.stats
    (the fixed-grid tests above pin specific values; this covers the space)."""
    from scipy import stats

    r = np.random.RandomState(7000 + seed)
    n = r.randint(1, 8)
    x = r.randn(n)
    mu = r.randn(n)
    var = 0.1 + r.rand(n)
    sigma = np.sqrt(var)

    np.testing.assert_allclose(
        np.asarray(ld.gaussian(x, mu, var)),
        stats.norm.logpdf(x, mu, sigma), rtol=1e-10)
    xp = 0.1 + r.rand(n)
    np.testing.assert_allclose(
        np.asarray(ld.lognormal(xp, mu, var)),
        stats.lognorm.logpdf(xp, s=sigma, scale=np.exp(mu)), rtol=1e-10)
    p = 0.05 + 0.9 * r.rand(n)
    yb = (r.rand(n) > 0.5).astype(float)
    np.testing.assert_allclose(
        np.asarray(ld.bernoulli(yb, p)),
        stats.bernoulli.logpmf(yb.astype(int), p), rtol=1e-10)
    lam = 0.3 + 2 * r.rand(n)
    k = r.poisson(2.0, n).astype(float)
    np.testing.assert_allclose(
        np.asarray(ld.poisson(k, lam)),
        stats.poisson.logpmf(k.astype(int), lam), rtol=1e-9)
    scale = 0.3 + r.rand(n)
    np.testing.assert_allclose(
        np.asarray(ld.exponential(xp, scale)),
        stats.expon.logpdf(xp, scale=scale), rtol=1e-10)
    shape = 0.5 + 2 * r.rand(n)
    np.testing.assert_allclose(
        np.asarray(ld.gamma(xp, shape, scale)),
        stats.gamma.logpdf(xp, shape, scale=scale), rtol=1e-9)
    df = 2.0 + 5 * r.rand(n)
    np.testing.assert_allclose(
        np.asarray(ld.student_t(x, mu, scale, df)),
        stats.t.logpdf(x, df, loc=mu, scale=scale), rtol=1e-9)
    xu = 0.05 + 0.9 * r.rand(n)
    a, b = 0.5 + 2 * r.rand(n), 0.5 + 2 * r.rand(n)
    np.testing.assert_allclose(
        np.asarray(ld.beta(xu, a, b)),
        stats.beta.logpdf(xu, a, b), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ld.laplace(x, mu, scale)),
        stats.laplace.logpdf(x, mu, scale), rtol=1e-10)

    d = r.randint(1, 5)
    A = 0.3 * r.randn(d, d)
    cov = A @ A.T + np.eye(d)
    L = np.linalg.cholesky(cov)
    xv = r.randn(d, 1)
    mv = r.randn(d, 1)
    np.testing.assert_allclose(
        np.asarray(ld.multivariate_normal(xv, mv, L)).ravel(),
        stats.multivariate_normal.logpdf(xv[:, 0], mv[:, 0], cov), rtol=1e-9)
