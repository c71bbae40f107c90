"""Randomized-hyperparameter fuzzing of model objectives against the
independent NumPy oracles in ``tests/oracles.py``.

``test_objective_oracles.py`` proves each objective at one fixed
configuration; this file samples 20 seeded random configurations per model
(shapes, kernel hyperparameters, noise, variational state) and re-checks the
<=1e-8 relative bar, so agreement holds across the hyperparameter space and
not just at the blessed point."""
import numpy as np
import pytest

from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.models import GPR, SGPR, SVGP, VGP

from tests import oracles

RTOL = 1e-8
N_SEEDS = 20


def _random_config(seed):
    r = np.random.RandomState(2000 + seed)
    N = r.randint(5, 30)
    D = r.randint(1, 4)
    M = r.randint(2, min(N, 10))
    P = r.randint(1, 3)
    var = 0.3 + 2 * r.rand()
    ls = 0.4 + r.rand(D)
    noise = 0.02 + 0.3 * r.rand()
    X = r.randn(N, D)
    Y = np.sin(X[:, :1]) + 0.2 * r.randn(N, P)
    Z = r.randn(M, D)
    return r, N, D, M, P, var, ls, noise, X, Y, Z


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_gpr_nlml_fuzz(seed):
    r, N, D, M, P, var, ls, noise, X, Y, Z = _random_config(seed)
    model = GPR(
        (X, Y), kernel=kernels.SquaredExponential(variance=var, lengthscales=ls),
        noise_variance=noise,
    )
    expected = oracles.gpr_nlml(X, Y, lambda a, b: oracles.rbf_np(a, b, var, ls), noise)
    np.testing.assert_allclose(float(model.log_marginal_likelihood()), expected, rtol=RTOL)


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_sgpr_elbo_fuzz(seed):
    r, N, D, M, P, var, ls, noise, X, Y, Z = _random_config(seed)
    model = SGPR(
        (X, Y), kernel=kernels.SquaredExponential(variance=var, lengthscales=ls),
        inducing_variable=Z, noise_variance=noise,
    )
    expected = oracles.sgpr_elbo(
        X, Y, Z, lambda a, b: oracles.rbf_np(a, b, var, ls), np.full(N, var), noise
    )
    np.testing.assert_allclose(float(model.elbo()), expected, rtol=RTOL)


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_svgp_elbo_fuzz(seed):
    r, N, D, M, P, var, ls, noise, X, Y, Z = _random_config(seed)
    whiten = bool(r.randint(2))
    q_mu = 0.5 * r.randn(M, P)
    q_sqrt = np.stack(
        [np.tril(0.3 * r.randn(M, M)) + np.diag(0.3 + r.rand(M)) for _ in range(P)]
    )
    model = SVGP(
        kernel=kernels.SquaredExponential(variance=var, lengthscales=ls),
        likelihood=likelihoods.Gaussian(noise),
        inducing_variable=Z.copy(), num_latent_gps=P, whiten=whiten,
        q_mu=q_mu, q_sqrt=q_sqrt,
    )
    kuu = oracles.rbf_np(Z, Z, var, ls) + oracles.JITTER * np.eye(M)
    kuf = oracles.rbf_np(Z, X, var, ls)
    S_list = oracles.q_sqrt_to_S(q_sqrt)
    fmu, fvar = oracles.svgp_q_moments(kuu, kuf, np.full(N, var), q_mu, S_list, whiten)
    kl = oracles.kl_white(q_mu, S_list) if whiten else oracles.kl_nonwhite(q_mu, S_list, kuu)
    expected = oracles.gauss_var_exp(fmu, fvar, Y, noise) - kl
    np.testing.assert_allclose(float(model.elbo((X, Y))), expected, rtol=RTOL)


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_vgp_elbo_fuzz(seed):
    r, N, D, M, P, var, ls, noise, X, Y, Z = _random_config(seed)
    model = VGP(
        (X, Y), kernel=kernels.SquaredExponential(variance=var, lengthscales=ls),
        likelihood=likelihoods.Gaussian(noise),
    )
    q_mu = 0.5 * r.randn(N, P)
    q_sqrt = np.stack(
        [np.tril(0.2 * r.randn(N, N)) + np.diag(0.3 + r.rand(N)) for _ in range(P)]
    )
    model.q_mu.assign(q_mu)
    model.q_sqrt.assign(q_sqrt)
    K = oracles.rbf_np(X, X, var, ls) + oracles.JITTER * np.eye(N)
    L = np.linalg.cholesky(K)
    S_list = oracles.q_sqrt_to_S(q_sqrt)
    fmu = L @ q_mu
    fvar = np.stack([np.diag(L @ S @ L.T) for S in S_list], axis=1)
    expected = oracles.gauss_var_exp(fmu, fvar, Y, noise) - oracles.kl_white(q_mu, S_list)
    np.testing.assert_allclose(float(model.elbo()), expected, rtol=RTOL)
