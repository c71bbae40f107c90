"""Conditionals must broadcast over leading dims of Xnew (reference
``tests/gpflow/conditionals/test_broadcasted_conditionals.py``): Xnew may be
[..., N, D] and conditional/sample_conditional broadcast over the [...] —
the sampled-f path of ``predict_f_samples`` and GPSSM-style rollouts rely
on this. Also the ``mix_latent_gp`` broadcasting oracle (ref ``:154-209``)."""
import numpy as np
import pytest

import gpflow_tpu
import gpflow_tpu.inducing_variables.multioutput as mf
import gpflow_tpu.kernels.multioutput as mk
from gpflow_tpu.conditionals import conditional, sample_conditional
from gpflow_tpu.conditionals.util import mix_latent_gp
from gpflow_tpu.inducing_variables import InducingPoints


class Data:
    S1, S2, N, M = 5, 4, 4, 3
    Dx, Dy, L = 2, 5, 4
    rng = np.random.RandomState(42)
    W = rng.randn(Dy, L)
    SX = rng.randn(S1 * S2, N, Dx)
    S1_S2_X = np.reshape(SX, [S1, S2, N, Dx])
    Z = rng.randn(M, Dx)


@pytest.mark.parametrize("full_cov", [False, True])
@pytest.mark.parametrize("white", [True, False])
@pytest.mark.parametrize("conditional_type", ["mixing", "Z", "inducing_points"])
def test_conditional_broadcasting(full_cov, white, conditional_type):
    rng = np.random.RandomState(1)
    q_mu = rng.randn(Data.M, Data.Dy)
    q_sqrt = np.tril(rng.randn(Data.Dy, Data.M, Data.M), -1) + np.eye(Data.M)

    if conditional_type == "Z":
        inducing_variable = Data.Z  # raw array: wrapped by the dispatcher
        kernel = gpflow_tpu.kernels.Matern52(lengthscales=0.5)
    elif conditional_type == "inducing_points":
        inducing_variable = InducingPoints(Data.Z)
        kernel = gpflow_tpu.kernels.Matern52(lengthscales=0.5)
    else:  # mixing
        q_mu = rng.randn(Data.M, Data.L)
        q_sqrt = np.tril(rng.randn(Data.L, Data.M, Data.M), -1) + np.eye(Data.M)
        inducing_variable = mf.SharedIndependentInducingVariables(InducingPoints(Data.Z))
        kernel = mk.LinearCoregionalization(
            [gpflow_tpu.kernels.Matern52(lengthscales=0.5) for _ in range(Data.L)],
            W=Data.W,
        )

    # Note: mixing + full_cov is implemented here (the reference skips it —
    # its sample_conditional raises NotImplementedError for that combination).
    num_samples = 5

    def sample_fn(X):
        return sample_conditional(
            X, inducing_variable, kernel, q_mu,
            q_sqrt=q_sqrt, white=white, full_cov=full_cov, num_samples=num_samples,
        )

    means = np.stack([np.asarray(sample_fn(X)[1]) for X in Data.SX])
    variances = np.stack([np.asarray(sample_fn(X)[2]) for X in Data.SX])

    samples_S12, means_S12, vars_S12 = sample_fn(Data.SX)
    assert np.asarray(samples_S12).shape[0] == Data.S1 * Data.S2
    np.testing.assert_allclose(np.asarray(means_S12), means, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vars_S12), variances, atol=1e-9)

    samples_S1_S2, means_S1_S2, vars_S1_S2 = sample_fn(Data.S1_S2_X)
    assert np.asarray(samples_S1_S2).shape == (
        Data.S1, Data.S2, num_samples, Data.N, Data.Dy,
    )
    np.testing.assert_allclose(
        np.asarray(means_S1_S2).reshape(Data.S1 * Data.S2, Data.N, Data.Dy),
        means, atol=1e-9,
    )
    if full_cov:
        np.testing.assert_allclose(
            np.asarray(vars_S1_S2).reshape(Data.S1 * Data.S2, Data.Dy, Data.N, Data.N),
            variances, atol=1e-9,
        )
    else:
        np.testing.assert_allclose(
            np.asarray(vars_S1_S2).reshape(Data.S1 * Data.S2, Data.N, Data.Dy),
            variances, atol=1e-9,
        )


@pytest.mark.parametrize("full_cov", [True, False])
@pytest.mark.parametrize("full_output_cov", [True, False])
def test_broadcasting_mix_latent_gps(full_cov, full_output_cov):
    """NumPy oracle for mix_latent_gp over a leading sample dim S
    (reference ``test_broadcasted_conditionals.py:154-209``)."""
    rng = np.random.RandomState(7)
    S, N = 7, 6
    P, L = 10, 5
    W = rng.randn(P, L)
    g_mu = rng.randn(S, N, L)

    g_sqrt_diag = np.tril(rng.randn(L * S, N, N), -1)
    g_sqrt_diag = np.reshape(g_sqrt_diag, [L, S, N, N])
    g_var_diag = g_sqrt_diag @ np.transpose(g_sqrt_diag, [0, 1, 3, 2])  # [L, S, N, N]
    g_var = np.zeros([S, N, L, N, L])
    for l in range(L):
        g_var[:, :, l, :, l] = g_var_diag[l]

    f_mu_ref = g_mu @ W.T  # [S, N, P]
    g_var_tmp = np.transpose(g_var, [0, 1, 3, 2, 4])  # [S, N, N, L, L]
    f_var_ref = W @ g_var_tmp @ W.T  # [S, N, N, P, P]
    f_var_ref = np.transpose(f_var_ref, [0, 1, 3, 2, 4])  # [S, N, P, N, P]

    if not full_cov:
        g_var_in = np.transpose(
            np.array([g_var_diag[:, :, n, n] for n in range(N)]), [2, 0, 1]
        )  # [S, N, L]
    else:
        g_var_in = g_var_diag  # [L, S, N, N]

    f_mu, f_var = mix_latent_gp(W, g_mu, g_var_in, full_cov, full_output_cov)

    if not full_output_cov and not full_cov:
        expected = np.array([f_var_ref[:, :, p, :, p] for p in range(P)])  # [P, S, N, N]
        expected = np.transpose(
            np.array([expected[:, :, n, n] for n in range(N)]), [2, 0, 1]
        )  # [S, N, P]
    elif not full_output_cov and full_cov:
        expected = np.array([f_var_ref[:, :, p, :, p] for p in range(P)])
        expected = np.transpose(expected, [1, 0, 2, 3])  # [S, P, N, N]
    elif full_output_cov and not full_cov:
        expected = np.array([f_var_ref[:, n, :, n, :] for n in range(N)])
        expected = np.transpose(expected, [1, 0, 2, 3])  # [S, N, P, P]
    else:
        expected = f_var_ref  # [S, N, P, N, P]

    np.testing.assert_allclose(f_mu_ref, np.asarray(f_mu), atol=1e-10)
    np.testing.assert_allclose(expected, np.asarray(f_var), atol=1e-10)
