"""sample_conditional tests (pattern from reference
``tests/gpflow/conditionals/test_sample_conditionals.py``)."""
import jax
import numpy as np
import pytest

from gpflow_tpu import kernels
from gpflow_tpu.conditionals import conditional, sample_conditional
from gpflow_tpu.inducing_variables import (
    InducingPoints,
    SharedIndependentInducingVariables,
)

rng = np.random.RandomState(0)
M, N, D, P, L = 5, 200, 2, 3, 2


def test_sample_conditional_moments_match():
    Z = rng.randn(M, D)
    X = rng.randn(8, D)
    q_mu = rng.randn(M, 1)
    q_sqrt = np.tril(0.2 * rng.randn(1, M, M) + np.eye(M))
    kernel = kernels.SquaredExponential()
    iv = InducingPoints(Z)

    samples, mean, cov = sample_conditional(
        X, iv, kernel, q_mu, q_sqrt=q_sqrt, white=True, num_samples=20000,
        key=jax.random.PRNGKey(0),
    )
    s = np.asarray(samples)
    assert s.shape == (20000, 8, 1)
    np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(s.var(0), np.asarray(cov), atol=0.05)


def test_sample_conditional_full_cov():
    Z = rng.randn(M, D)
    X = rng.randn(6, D)
    q_mu = rng.randn(M, 1)
    kernel = kernels.SquaredExponential()
    iv = InducingPoints(Z)
    samples, mean, cov = sample_conditional(
        X, iv, kernel, q_mu, q_sqrt=None, white=True, full_cov=True, num_samples=4000,
        key=jax.random.PRNGKey(1),
    )
    s = np.asarray(samples)
    assert s.shape == (4000, 6, 1)
    emp_cov = np.cov(s[:, :, 0].T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov)[0], atol=0.08)


def test_sample_conditional_coregionalization_efficient_path():
    ks = [kernels.SquaredExponential(lengthscales=0.5 + i) for i in range(L)]
    W = rng.randn(P, L)
    kernel = kernels.LinearCoregionalization(ks, W=W)
    iv = SharedIndependentInducingVariables(InducingPoints(rng.randn(M, D)))
    q_mu = rng.randn(M, L)
    q_sqrt = np.tril(0.2 * rng.randn(L, M, M) + np.eye(M))
    X = rng.randn(7, D)
    samples, mean, cov = sample_conditional(
        X, iv, kernel, q_mu, q_sqrt=q_sqrt, white=True, num_samples=20000,
        key=jax.random.PRNGKey(2),
    )
    s = np.asarray(samples)
    assert s.shape == (20000, 7, P)
    np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.06)
    # moments must match the generic conditional
    m2, v2 = conditional(X, iv, kernel, q_mu, q_sqrt=q_sqrt, white=True)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(v2), atol=1e-8)
