"""SVGP variational correctness against closed-form univariate/multivariate
oracles (reference ``tests/gpflow/models/test_variational.py``).

Stronger than the reference: the reference asserts with ``atol=4``; here the
variational distribution is set to the EXACT posterior (Z = X, conjugate
Gaussian likelihood), where the ELBO is tight — every assertion is at
float64 oracle tolerance.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

import gpflow_tpu
from gpflow_tpu.conditionals import conditional
from gpflow_tpu.inducing_variables import InducingPoints
from gpflow_tpu.kernels import SquaredExponential
from gpflow_tpu.likelihoods import Gaussian

from ..kernels.reference import ref_rbf_kernel

rng = np.random.RandomState(1)


@pytest.fixture(autouse=True)
def _no_jitter():
    """The closed-form oracles have no Cholesky jitter; zero it so assertions
    can sit at float64 tolerance instead of the 1e-6 jitter floor."""
    import dataclasses

    from gpflow_tpu.config import as_context, config

    with as_context(dataclasses.replace(config(), jitter=0.0)):
        yield


def univariate_log_marginal_likelihood(y, K, noise_var):
    """log N(y | 0, K + noise_var) for scalar y."""
    return -0.5 * y * y / (K + noise_var) - 0.5 * np.log(K + noise_var) - 0.5 * np.log(2 * np.pi)


def univariate_posterior(y, K, noise_var):
    mean = K * y / (K + noise_var)
    variance = K - K * K / (K + noise_var)
    return mean, variance


def univariate_prior_KL(mean_a, mean_b, var_a, var_b):
    """KL[N(mean_a, var_a) || N(mean_b, var_b)], scalars."""
    return 0.5 * (
        np.log(var_b) - np.log(var_a) - 1.0 + var_a / var_b + (mean_b - mean_a) ** 2 / var_b
    )


def multivariate_prior_KL(mean_a, cov_a, mean_b, cov_b):
    """KL[N(mean_a, cov_a) || N(mean_b, cov_b)], [N, 1] means / [N, N] covs."""
    n = cov_a.shape[0]
    trace_term = 0.5 * np.trace(np.linalg.solve(cov_b, cov_a))
    delta = mean_b - mean_a
    mahalanobis = 0.5 * float((delta.T @ np.linalg.solve(cov_b, delta)).squeeze())
    logdets = 0.5 * (np.linalg.slogdet(cov_b)[1] - np.linalg.slogdet(cov_a)[1])
    return trace_term + mahalanobis - 0.5 * n + logdets


class Datum:
    """Single data point, Z = X, kernel variance K(0,0) = 1 so the whitened
    and unwhitened parameterizations coincide (L = 1)."""

    num_latent_gps = 1
    y_data = 2.0
    X = np.array([[0.0]])
    Y = np.array([[y_data]])
    Z = X.copy()
    K = 1.0
    noise_var = 0.5
    posterior_mean, posterior_var = univariate_posterior(y_data, K, noise_var)
    posterior_std = np.sqrt(posterior_var)
    data = (X, Y)


def _univariate_svgp(diag: bool, whiten: bool) -> gpflow_tpu.models.SVGP:
    q_mu = np.full((1, Datum.num_latent_gps), Datum.posterior_mean)
    ones = np.ones((1, Datum.num_latent_gps)) if diag else np.ones((1, 1, Datum.num_latent_gps))
    q_sqrt = ones * Datum.posterior_std
    return gpflow_tpu.models.SVGP(
        kernel=SquaredExponential(variance=Datum.K),
        likelihood=Gaussian(Datum.noise_var),
        inducing_variable=Datum.Z,
        num_latent_gps=Datum.num_latent_gps,
        q_diag=diag,
        whiten=whiten,
        q_mu=q_mu,
        q_sqrt=q_sqrt,
    )


def test_reference_implementation_consistency():
    q_mean = rng.rand(1, 1)
    q_cov = rng.rand(1, 1)
    p_mean = rng.rand(1, 1)
    p_cov = rng.rand(1, 1)
    assert_allclose(
        univariate_prior_KL(
            q_mean.squeeze(), p_mean.squeeze(), q_cov.squeeze(), p_cov.squeeze()
        ),
        multivariate_prior_KL(q_mean, q_cov, p_mean, p_cov),
        rtol=1e-12,
    )


@pytest.mark.parametrize("diag", [True, False])
@pytest.mark.parametrize("whiten", [True, False])
def test_univariate_prior_KL(diag, whiten):
    model = _univariate_svgp(diag, whiten)
    reference_kl = univariate_prior_KL(
        Datum.posterior_mean, 0.0, Datum.posterior_var, Datum.K
    )
    assert_allclose(np.asarray(model.prior_kl()), reference_kl, rtol=1e-10)


@pytest.mark.parametrize("diag", [True, False])
@pytest.mark.parametrize("whiten", [True, False])
def test_univariate_elbo_is_tight(diag, whiten):
    """With q = exact posterior and Z = X, the ELBO equals the log marginal
    likelihood exactly (Titsias bound is tight)."""
    model = _univariate_svgp(diag, whiten)
    lml = univariate_log_marginal_likelihood(Datum.y_data, Datum.K, Datum.noise_var)
    assert_allclose(np.asarray(model.elbo(Datum.data)), lml, rtol=1e-10)


@pytest.mark.parametrize("diag", [True, False])
@pytest.mark.parametrize("whiten", [True, False])
@pytest.mark.parametrize("wrap_iv", [False, True], ids=["dense", "inducing"])
def test_univariate_conditionals(diag, whiten, wrap_iv):
    """conditional() at X recovers the exact univariate posterior, through
    both the dense (raw-array Z) and sparse (InducingPoints) registrations."""
    model = _univariate_svgp(diag, whiten)
    Z = InducingPoints(Datum.Z) if wrap_iv else Datum.Z
    fmean, fvar = conditional(
        Datum.X, Z, model.kernel, model.q_mu.value, q_sqrt=model.q_sqrt.value, white=whiten
    )
    assert_allclose(np.asarray(fmean)[0, 0], Datum.posterior_mean, rtol=1e-10)
    assert_allclose(np.asarray(fvar)[0, 0], Datum.posterior_var, rtol=1e-10)


class MultiDatum:
    dim = 3
    num_latent_gps = 1
    Y = rng.randn(dim, 1)
    X = rng.randn(dim, 1)
    Z = X.copy()
    noise_var = 0.5
    signal_var = 1.5
    ls = 1.7
    q_mean = rng.randn(dim, num_latent_gps)
    q_sqrt_diag = rng.rand(dim, num_latent_gps)
    q_sqrt_full = np.tril(rng.rand(dim, dim)) + np.eye(dim)


@pytest.mark.parametrize("whiten", [True, False])
def test_multivariate_prior_KL_full_q(whiten):
    cov_q = MultiDatum.q_sqrt_full @ MultiDatum.q_sqrt_full.T
    mean_prior = np.zeros((MultiDatum.dim, 1))
    cov_prior = (
        np.eye(MultiDatum.dim)
        if whiten
        else ref_rbf_kernel(MultiDatum.X, MultiDatum.ls, MultiDatum.signal_var)
    )
    reference_kl = multivariate_prior_KL(MultiDatum.q_mean, cov_q, mean_prior, cov_prior)

    model = gpflow_tpu.models.SVGP(
        kernel=SquaredExponential(variance=MultiDatum.signal_var, lengthscales=MultiDatum.ls),
        likelihood=Gaussian(MultiDatum.noise_var),
        inducing_variable=MultiDatum.Z,
        num_latent_gps=MultiDatum.num_latent_gps,
        q_diag=False,
        whiten=whiten,
        q_mu=MultiDatum.q_mean,
        q_sqrt=MultiDatum.q_sqrt_full[None, :, :],
    )
    assert_allclose(np.asarray(model.prior_kl()), reference_kl, rtol=1e-9)


@pytest.mark.parametrize("whiten", [True, False])
def test_multivariate_prior_KL_diag_q(whiten):
    """Diag-q path of prior_kl against the same multivariate oracle."""
    cov_q = np.diag(MultiDatum.q_sqrt_diag[:, 0] ** 2)
    mean_prior = np.zeros((MultiDatum.dim, 1))
    cov_prior = (
        np.eye(MultiDatum.dim)
        if whiten
        else ref_rbf_kernel(MultiDatum.X, MultiDatum.ls, MultiDatum.signal_var)
    )
    reference_kl = multivariate_prior_KL(MultiDatum.q_mean, cov_q, mean_prior, cov_prior)

    model = gpflow_tpu.models.SVGP(
        kernel=SquaredExponential(variance=MultiDatum.signal_var, lengthscales=MultiDatum.ls),
        likelihood=Gaussian(MultiDatum.noise_var),
        inducing_variable=MultiDatum.Z,
        num_latent_gps=MultiDatum.num_latent_gps,
        q_diag=True,
        whiten=whiten,
        q_mu=MultiDatum.q_mean,
        q_sqrt=MultiDatum.q_sqrt_diag,
    )
    assert_allclose(np.asarray(model.prior_kl()), reference_kl, rtol=1e-9)
