"""predict_mean (mean-only fast-serving path) must agree exactly with
predict_f's mean on every posterior family it specializes, plus the
default fallback."""
import numpy as np
import pytest

import gpflow_tpu as gpf
from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.inducing_variables import (
    InducingPoints,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)
from gpflow_tpu.models import GPR, SGPR, SVGP, VGP

rng = np.random.RandomState(0)
N, D, M, Nnew = 40, 2, 8, 11
X = rng.randn(N, D)
Y = np.sin(X[:, :1]) + 0.1 * rng.randn(N, 1)
Xnew = rng.randn(Nnew, D)
MEAN_FN = gpf.functions.Constant(0.7)


def _check(posterior, out_dim=1):
    mean_full, _ = posterior.predict_f(Xnew)
    mean_only = posterior.predict_mean(Xnew)
    assert np.asarray(mean_only).shape == (Nnew, out_dim)
    np.testing.assert_allclose(
        np.asarray(mean_only), np.asarray(mean_full), rtol=1e-10, atol=1e-12
    )


def test_gpr_posterior_predict_mean():
    m = GPR((X, Y), kernel=kernels.Matern52(), noise_variance=0.05, mean_function=MEAN_FN)
    _check(m.posterior())


def test_sgpr_posterior_predict_mean():
    m = SGPR(
        (X, Y), kernel=kernels.SquaredExponential(), inducing_variable=X[:M].copy(),
        mean_function=MEAN_FN,
    )
    _check(m.posterior())


@pytest.mark.parametrize("whiten", [True, False])
@pytest.mark.parametrize("q_diag", [False, True])
def test_svgp_posterior_predict_mean(whiten, q_diag):
    m = SVGP(
        kernel=kernels.SquaredExponential(),
        likelihood=likelihoods.Gaussian(0.1),
        inducing_variable=X[:M].copy(),
        whiten=whiten,
        q_diag=q_diag,
        mean_function=MEAN_FN,
        num_data=N,
    )
    m.q_mu.assign(rng.randn(M, 1))
    _check(m.posterior())


def test_multioutput_separate_independent_predict_mean():
    L = 3
    kern = kernels.SeparateIndependent(
        [kernels.SquaredExponential(lengthscales=1.0 + 0.2 * i) for i in range(L)]
    )
    iv = SeparateIndependentInducingVariables(
        [InducingPoints(rng.randn(M, D)) for _ in range(L)]
    )
    m = SVGP(
        kernel=kern, likelihood=likelihoods.Gaussian(0.1), inducing_variable=iv,
        num_data=N, num_latent_gps=L,
    )
    m.q_mu.assign(rng.randn(M, L))
    _check(m.posterior(), out_dim=L)


def test_linear_coregionalization_predict_mean():
    L, P = 2, 4
    kern = kernels.LinearCoregionalization(
        [kernels.SquaredExponential(), kernels.Matern32()], W=rng.randn(P, L)
    )
    iv = SharedIndependentInducingVariables(InducingPoints(rng.randn(M, D)))
    m = SVGP(
        kernel=kern, likelihood=likelihoods.Gaussian(0.1), inducing_variable=iv,
        num_data=N, num_latent_gps=L,
    )
    m.q_mu.assign(rng.randn(M, L))
    _check(m.posterior(), out_dim=P)


def test_vgp_posterior_default_fallback():
    m = VGP((X, Y), kernel=kernels.SquaredExponential(), likelihood=likelihoods.Gaussian(0.1))
    m.q_mu.assign(rng.randn(N, 1))
    _check(m.posterior())


def test_predict_mean_nocache_falls_back_to_fused():
    from gpflow_tpu.posteriors import PrecomputeCacheType

    m = SVGP(
        kernel=kernels.SquaredExponential(),
        likelihood=likelihoods.Gaussian(0.1),
        inducing_variable=X[:M].copy(),
        num_data=N,
    )
    m.q_mu.assign(rng.randn(M, 1))
    post = m.posterior(PrecomputeCacheType.NOCACHE)
    mean = post.predict_mean(Xnew)
    mean_ref, _ = post.fused_predict_f(Xnew)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), rtol=1e-12)
