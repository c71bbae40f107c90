"""Randomized multioutput-conditional fuzzing vs a dense NumPy oracle.

For random (L latent GPs, P outputs, W mixing, kernel hyperparameters,
shared/separate inducing variables, q_sqrt form, whiten) configurations, the
LinearCoregionalization conditional must equal the oracle:

    per latent l: (mu_l, s_l) = single-output conditional in g-space
    mean = mu W^T,   var[:, p] = sum_l W[p,l]^2 s_l    (independent latents)

computed with np.linalg only. SharedIndependent/SeparateIndependent kernels
are covered as the W = identity special case with P = L."""
import numpy as np
import pytest

from gpflow_tpu import kernels
from gpflow_tpu.conditionals import conditional
from gpflow_tpu.config import default_jitter
from gpflow_tpu.inducing_variables import (
    InducingPoints,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)

N_SEEDS = 25


def _np_single_output(kernel, Z, X, q_mu_l, S_l, white):
    M = len(Z)
    Kmm = np.asarray(kernel(Z, Z)) + default_jitter() * np.eye(M)
    Kmn = np.asarray(kernel(Z, X))
    Knn_diag = np.asarray(kernel(X, full_cov=False))
    L = np.linalg.cholesky(Kmm)
    if white:
        A = np.linalg.inv(L) @ Kmn
    else:
        A = np.linalg.inv(Kmm) @ Kmn
    Ared = np.linalg.inv(L) @ Kmn  # reduction uses L^-1 Kmn in both cases
    mean = A.T @ q_mu_l
    base_var = Knn_diag - np.sum(Ared * Ared, axis=0)
    var = base_var + (np.sum(A * (S_l @ A), axis=0) if S_l is not None else 0.0)
    return mean, var


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_lcm_conditional_random_config_vs_numpy_oracle(seed):
    r = np.random.RandomState(4000 + seed)
    L = r.randint(1, 4)
    P = r.randint(1, 5)
    M = r.randint(2, 7)
    N = r.randint(1, 6)
    D = r.randint(1, 3)
    white = bool(r.randint(2))
    q_form = ["none", "diag", "full"][r.randint(3)]
    shared_iv = bool(r.randint(2))

    ks = [
        kernels.SquaredExponential(variance=0.5 + r.rand(), lengthscales=0.5 + r.rand())
        for _ in range(L)
    ]
    W = r.randn(P, L)
    kernel = kernels.LinearCoregionalization(ks, W=W)

    Zs = [r.randn(M, D) for _ in range(L)]
    if shared_iv:
        Zs = [Zs[0]] * L
        iv = SharedIndependentInducingVariables(InducingPoints(Zs[0].copy()))
    else:
        iv = SeparateIndependentInducingVariables(
            [InducingPoints(Z.copy()) for Z in Zs]
        )

    X = r.randn(N, D)
    q_mu = 0.6 * r.randn(M, L)
    if q_form == "none":
        q_sqrt = None
        S_list = [None] * L
    elif q_form == "diag":
        q_sqrt = 0.2 + r.rand(M, L)
        S_list = [np.diag(q_sqrt[:, l] ** 2) for l in range(L)]
    else:
        q_sqrt = np.tril(0.3 * r.randn(L, M, M)) + np.eye(M)
        S_list = [q_sqrt[l] @ q_sqrt[l].T for l in range(L)]

    mean, var = conditional(X, iv, kernel, q_mu, q_sqrt=q_sqrt, white=white)

    g_means = np.zeros((N, L))
    g_vars = np.zeros((N, L))
    for l in range(L):
        m_l, v_l = _np_single_output(ks[l], Zs[l], X, q_mu[:, l], S_list[l], white)
        g_means[:, l] = m_l
        g_vars[:, l] = v_l
    mean_o = g_means @ W.T
    var_o = g_vars @ (W.T**2)

    np.testing.assert_allclose(np.asarray(mean), mean_o, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), var_o, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("seed", range(10))
def test_separate_independent_conditional_random_config_vs_numpy_oracle(seed):
    r = np.random.RandomState(5000 + seed)
    P = r.randint(1, 4)
    M = r.randint(2, 7)
    N = r.randint(1, 6)
    D = r.randint(1, 3)
    white = bool(r.randint(2))

    ks = [
        kernels.Matern32(variance=0.5 + r.rand(), lengthscales=0.5 + r.rand())
        for _ in range(P)
    ]
    kernel = kernels.SeparateIndependent(ks)
    Z = r.randn(M, D)
    iv = SharedIndependentInducingVariables(InducingPoints(Z.copy()))
    X = r.randn(N, D)
    q_mu = 0.6 * r.randn(M, P)
    q_sqrt = np.tril(0.3 * r.randn(P, M, M)) + np.eye(M)

    mean, var = conditional(X, iv, kernel, q_mu, q_sqrt=q_sqrt, white=white)

    mean_o = np.zeros((N, P))
    var_o = np.zeros((N, P))
    for p in range(P):
        S_p = q_sqrt[p] @ q_sqrt[p].T
        mean_o[:, p], var_o[:, p] = _np_single_output(
            ks[p], Z, X, q_mu[:, p], S_p, white
        )

    np.testing.assert_allclose(np.asarray(mean), mean_o, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), var_o, rtol=1e-7, atol=1e-9)
