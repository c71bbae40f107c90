"""Multioutput conditional equivalence sweep (pattern from reference
``tests/gpflow/conditionals/test_multioutput.py``): the cheap/efficient
code paths must agree with their general/fallback counterparts.

* SharedIndependent(k, P) == SeparateIndependent([k] * P) when the kernels
  are identical.
* Shared/SeparateIndependentInducingVariables (efficient posteriors) ==
  Fallback wrappers (interdomain code path).
* LinearCoregionalization with W = I_P on P latents == SeparateIndependent.
"""
import numpy as np
import pytest

from gpflow_tpu import kernels
from gpflow_tpu.conditionals import conditional
from gpflow_tpu.inducing_variables import (
    FallbackSeparateIndependentInducingVariables,
    FallbackSharedIndependentInducingVariables,
    InducingPoints,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)

rng = np.random.RandomState(8)
N, D, M, P = 7, 2, 5, 3

X = rng.randn(N, D)
Z = rng.randn(M, D)
Q_MU = rng.randn(M, P)
Q_SQRT = np.tril(rng.randn(P, M, M) * 0.2 + 1.4 * np.eye(M)[None])


def _shared_kernel():
    return kernels.SharedIndependent(
        kernels.SquaredExponential(lengthscales=0.9), output_dim=P
    )


def _separate_equal_kernels():
    return kernels.SeparateIndependent(
        [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)]
    )


def _assert_same(res_a, res_b, atol=1e-8):
    np.testing.assert_allclose(np.asarray(res_a[0]), np.asarray(res_b[0]), atol=atol)
    np.testing.assert_allclose(np.asarray(res_a[1]), np.asarray(res_b[1]), atol=atol)


@pytest.mark.parametrize("whiten", [True, False])
@pytest.mark.parametrize("full_cov", [False, True])
def test_shared_equals_separate_with_equal_kernels(whiten, full_cov):
    iv = SharedIndependentInducingVariables(InducingPoints(Z.copy()))
    res_shared = conditional(
        X, iv, _shared_kernel(), Q_MU, q_sqrt=Q_SQRT, white=whiten, full_cov=full_cov
    )
    res_sep = conditional(
        X, iv, _separate_equal_kernels(), Q_MU, q_sqrt=Q_SQRT, white=whiten, full_cov=full_cov
    )
    _assert_same(res_shared, res_sep)


@pytest.mark.parametrize("whiten", [True, False])
@pytest.mark.parametrize("fallback_cls, efficient_cls", [
    (FallbackSharedIndependentInducingVariables, SharedIndependentInducingVariables),
])
def test_efficient_equals_fallback_lcm_shared(whiten, fallback_cls, efficient_cls):
    """Fallback IVs dispatch only with IndependentLatent kernels (reference
    ``posteriors.py:1068-1076``); LinearCoregionalization is the concrete
    one. The fallback interdomain path must agree with the efficient
    g-space path."""
    W = rng.randn(P, P)
    def lcm():
        return kernels.LinearCoregionalization(
            [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)], W=W
        )
    iv_eff = efficient_cls(InducingPoints(Z.copy()))
    iv_fb = fallback_cls(InducingPoints(Z.copy()))
    res_eff = conditional(X, iv_eff, lcm(), Q_MU, q_sqrt=Q_SQRT, white=whiten)
    res_fb = conditional(
        X, iv_fb, lcm(), Q_MU, q_sqrt=Q_SQRT, white=whiten, full_output_cov=False
    )
    _assert_same(res_eff, res_fb, atol=1e-7)


@pytest.mark.parametrize("whiten", [True, False])
def test_efficient_equals_fallback_lcm_separate(whiten):
    W = rng.randn(P, P)
    def lcm():
        return kernels.LinearCoregionalization(
            [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)], W=W
        )
    iv_eff = SeparateIndependentInducingVariables(
        [InducingPoints(Z.copy()) for _ in range(P)]
    )
    iv_fb = FallbackSeparateIndependentInducingVariables(
        [InducingPoints(Z.copy()) for _ in range(P)]
    )
    res_eff = conditional(X, iv_eff, lcm(), Q_MU, q_sqrt=Q_SQRT, white=whiten)
    res_fb = conditional(
        X, iv_fb, lcm(), Q_MU, q_sqrt=Q_SQRT, white=whiten, full_output_cov=False
    )
    _assert_same(res_eff, res_fb, atol=1e-7)


@pytest.mark.parametrize("whiten", [True, False])
def test_coregionalization_identity_mixing_equals_separate(whiten):
    base = [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)]
    lcm = kernels.LinearCoregionalization(
        [kernels.SquaredExponential(lengthscales=0.9) for _ in range(P)], W=np.eye(P)
    )
    iv = SharedIndependentInducingVariables(InducingPoints(Z.copy()))
    res_lcm = conditional(X, iv, lcm, Q_MU, q_sqrt=Q_SQRT, white=whiten)
    res_sep = conditional(
        X, iv, kernels.SeparateIndependent(base), Q_MU, q_sqrt=Q_SQRT, white=whiten
    )
    _assert_same(res_lcm, res_sep, atol=1e-7)


def test_fully_correlated_inducing_points_shape():
    """Plain InducingPoints x MultioutputKernel routes through the fully
    correlated [M*P] path (reference A.1 dispatch matrix)."""
    kernel = _shared_kernel()
    iv = InducingPoints(Z.copy())
    q_mu = rng.randn(M * P, 1)
    q_sqrt = np.tril(rng.randn(1, M * P, M * P) * 0.1 + np.eye(M * P)[None])
    mean, var = conditional(X, iv, kernel, q_mu, q_sqrt=q_sqrt, white=True)
    assert mean.shape == (N, P)
    assert var.shape == (N, P)
