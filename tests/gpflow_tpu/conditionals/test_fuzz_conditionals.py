"""Randomized-configuration fuzzing of the conditional engine against a
dense NumPy oracle.

The structured grids (test_posteriors.py, test_multioutput.py) enumerate the
designed combinations; this file samples 40 SEEDED random configurations —
kernel family, shapes, q_sqrt form, whiten, full_cov — and checks
``conditional`` and the matching cached posterior against an independent
dense-NumPy derivation of

    mean = A^T m,     cov = Knn - A^T A + (A' S A')  with
    A = Kmm^-1 Kmn (non-white) or L^-1 Kmn (white)

computed with np.linalg.inv/cholesky only (no code shared with the library
path, which runs Cholesky solves or the INV_SOLVE fusion). Agreement across
arbitrary random configurations is evidence the engine's math is right
everywhere, not just at the grid points."""
import numpy as np
import pytest

from gpflow_tpu import kernels
from gpflow_tpu.conditionals import conditional
from gpflow_tpu.config import default_jitter
from gpflow_tpu.inducing_variables import InducingPoints
from gpflow_tpu.posteriors import PrecomputeCacheType, create_posterior

KERNEL_FAMILIES = [
    lambda r: kernels.SquaredExponential(
        variance=0.5 + r.rand(), lengthscales=0.5 + r.rand()
    ),
    lambda r: kernels.Matern12(variance=0.5 + r.rand(), lengthscales=0.5 + r.rand()),
    lambda r: kernels.Matern32(variance=0.5 + r.rand(), lengthscales=0.5 + r.rand()),
    lambda r: kernels.Matern52(
        variance=0.5 + r.rand(), lengthscales=0.3 + r.rand(2)
    ),
    lambda r: kernels.RationalQuadratic(alpha=0.5 + 2 * r.rand()),
    lambda r: kernels.Linear(variance=0.5 + r.rand()),
    lambda r: kernels.Polynomial(degree=2.0),
    lambda r: kernels.SquaredExponential() + kernels.Linear(),
    lambda r: kernels.SquaredExponential() * kernels.Constant(variance=0.7),
]


def _np_kernel(kernel, A, B):
    return np.asarray(kernel(A, B))


def _oracle(kernel, Z, X, q_mu, q_sqrt_form, q_sqrt, white, full_cov):
    M = len(Z)
    Kmm = _np_kernel(kernel, Z, Z) + default_jitter() * np.eye(M)
    Kmn = _np_kernel(kernel, Z, X)
    Knn = _np_kernel(kernel, X, X)

    L = np.linalg.cholesky(Kmm)
    if white:
        A = np.linalg.inv(L) @ Kmn  # [M, N]
    else:
        A = np.linalg.inv(Kmm) @ Kmn

    mean = A.T @ q_mu  # [N, R]
    if white:
        base_cov = Knn - (np.linalg.inv(L) @ Kmn).T @ (np.linalg.inv(L) @ Kmn)
    else:
        base_cov = Knn - Kmn.T @ np.linalg.inv(Kmm) @ Kmn

    R = q_mu.shape[1]
    covs = []
    for rr in range(R):
        if q_sqrt_form == "none":
            S = None
        elif q_sqrt_form == "diag":
            S = np.diag(q_sqrt[:, rr] ** 2)
        else:
            Lq = np.tril(q_sqrt[rr])
            S = Lq @ Lq.T
        cov_r = base_cov.copy()
        if S is not None:
            cov_r = cov_r + A.T @ S @ A
        covs.append(cov_r)
    cov = np.stack(covs)  # [R, N, N]
    if full_cov:
        return mean, cov
    return mean, np.stack([np.diag(c) for c in covs], axis=1)  # [N, R]


@pytest.mark.parametrize("seed", range(40))
def test_conditional_random_config_vs_numpy_oracle(seed):
    r = np.random.RandomState(1000 + seed)
    M = r.randint(2, 9)
    N = r.randint(1, 8)
    D = r.randint(1, 4)
    R = r.randint(1, 4)
    kernel_factory = KERNEL_FAMILIES[r.randint(len(KERNEL_FAMILIES))]
    kernel = kernel_factory(r)
    if getattr(kernel, "ard_active_dims_hint", None) is None:
        # ARD lengthscales need matching D; rebuild scalar-lengthscale kernels
        ls = getattr(kernel, "lengthscales", None)
        if ls is not None and np.asarray(ls.value).ndim == 1 and np.asarray(ls.value).shape[0] != D:
            kernel = kernels.SquaredExponential(lengthscales=0.3 + r.rand(D))

    white = bool(r.randint(2))
    full_cov = bool(r.randint(2))
    q_sqrt_form = ["none", "diag", "full"][r.randint(3)]

    Z = r.randn(M, D)
    X = r.randn(N, D)
    q_mu = 0.7 * r.randn(M, R)
    if q_sqrt_form == "none":
        q_sqrt = None
    elif q_sqrt_form == "diag":
        q_sqrt = 0.2 + r.rand(M, R)
    else:
        q_sqrt = np.tril(0.3 * r.randn(R, M, M)) + np.eye(M)

    mean, var = conditional(
        X, InducingPoints(Z), kernel, q_mu, q_sqrt=q_sqrt, white=white, full_cov=full_cov
    )
    mean_o, var_o = _oracle(kernel, Z, X, q_mu, q_sqrt_form, q_sqrt, white, full_cov)

    np.testing.assert_allclose(np.asarray(mean), mean_o, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), var_o, rtol=1e-7, atol=1e-9)

    # The cached posterior must agree too. Its (alpha, Qinv) representation
    # intrinsically loses ~cond(Kuu)*eps accuracy relative to the fused
    # Cholesky pipeline (the reference's cache has the same property —
    # ref posteriors.py Qinv), and random 1-D configs routinely produce
    # cond(Kuu) ~ 1e7 (a Linear kernel's Kuu is rank-D + jitter). The
    # variance error of an inverse-based covariance grows ~cond^2 * eps,
    # so the cache tolerance scales quadratically with the conditioning.
    Kmm = np.asarray(kernel(Z)) + default_jitter() * np.eye(M)
    cond = np.linalg.cond(Kmm)
    cache_atol = max(1e-9, cond**2 * 1e-15)
    posterior = create_posterior(
        kernel, InducingPoints(Z), q_mu, q_sqrt, white, precompute_cache=None
    )
    posterior.update_cache(PrecomputeCacheType.TENSOR)
    mean_c, var_c = posterior.predict_f(X, full_cov=full_cov)
    np.testing.assert_allclose(np.asarray(mean_c), mean_o, rtol=1e-6, atol=cache_atol)
    np.testing.assert_allclose(np.asarray(var_c), var_o, rtol=1e-5, atol=cache_atol)
