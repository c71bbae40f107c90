"""MarkovGaussian expectations vs Monte-Carlo oracles (extends the
expectations grid; reference registrations at ``expectations/linears.py``
and ``expectations/misc.py`` Markov cases). The MarkovGaussian carries
mu [N+1, D] and cov [2, N+1, D, D] (marginals + consecutive cross-covs,
reference ``probability_distributions.py:83-105``)."""
import numpy as np
import pytest

from gpflow_tpu import kernels
from gpflow_tpu import functions as mfn
from gpflow_tpu.expectations import expectation
from gpflow_tpu.inducing_variables import InducingPoints
from gpflow_tpu.probability_distributions import MarkovGaussian

rng = np.random.RandomState(47)
N, D, M = 5, 2, 4

MU = rng.randn(N + 1, D)


def _markov():
    # per-step marginal covariances and valid consecutive cross-covariances
    # constructed from a joint AR(1)-like process so that the implied joint
    # covariance is PSD
    A = 0.5 * np.eye(D)
    Q = np.eye(D)
    covs = np.zeros((N + 1, D, D))
    cross = np.zeros((N + 1, D, D))
    covs[0] = np.eye(D)
    for t in range(N):
        cross[t] = covs[t] @ A.T  # Cov(x_t, x_{t+1})
        covs[t + 1] = A @ covs[t] @ A.T + Q
    cov = np.stack([covs, cross])
    return MarkovGaussian(MU, cov), A, Q


def _sample_chain(n_samples, A, Q):
    """Samples x_0..x_N from the AR(1) chain matching ``_markov``."""
    xs = np.zeros((n_samples, N + 1, D))
    xs[:, 0] = MU[0] + rng.randn(n_samples, D)
    for t in range(N):
        noise = rng.randn(n_samples, D) @ np.linalg.cholesky(Q).T
        xs[:, t + 1] = MU[t + 1] + (xs[:, t] - MU[t]) @ A.T + noise
    return xs


def test_markov_linear_identity_cross_moment_vs_mc():
    """<K(Z, x_n) x_{n+1}^T> for a Linear kernel vs 200k-sample MC."""
    p, A, Q = _markov()
    Z = rng.randn(M, D)
    kern = kernels.Linear(variance=1.3)
    analytic = np.asarray(
        expectation(p, (kern, InducingPoints(Z)), mfn.Identity())
    )
    assert analytic.shape == (N, M, D)

    xs = _sample_chain(200_000, A, Q)
    # K(Z, x_n) = variance * Z @ x_n  -> [S, N, M]
    kzx = 1.3 * np.einsum("md,snd->snm", Z, xs[:, :-1])
    mc = np.einsum("snm,sne->nme", kzx, xs[:, 1:]) / len(xs)
    np.testing.assert_allclose(analytic, mc, rtol=0.05, atol=0.05)


def test_markov_identity_first_moment():
    """<x_n> under the Markov distribution is just mu[:-1] (generic path)."""
    p, _, _ = _markov()
    out = np.asarray(expectation(p, mfn.Identity()))
    np.testing.assert_allclose(out, MU[:-1], atol=1e-9)


def test_markov_kernel_diag_falls_back_like_gaussian():
    """psi0-style <K(x_n, x_n)> under Markov equals the Gaussian marginal
    computation (the Markov cross-covs are irrelevant for single-time
    moments)."""
    from gpflow_tpu.probability_distributions import Gaussian

    p, _, _ = _markov()
    kern = kernels.SquaredExponential(variance=0.7)
    markov_val = np.asarray(expectation(p, kern))
    gauss = Gaussian(MU[:-1], p.cov[0, :-1])
    gauss_val = np.asarray(expectation(gauss, kern))
    np.testing.assert_allclose(markov_val, gauss_val, rtol=1e-8)
