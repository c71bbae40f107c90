"""model.predict_f vs model.posterior().predict_f (patterns from reference
``tests/gpflow/models/test_{gpr,sgpr,svgp,vgp}_posterior.py``): the cached
posterior must reproduce the fused model prediction for every cache type,
and stay correct after hyperparameters change + update_cache."""
import numpy as np
import pytest

import gpflow_tpu as gpf
from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.models import GPR, SGPR, SVGP, VGP
from gpflow_tpu.posteriors import PrecomputeCacheType

rng = np.random.RandomState(31)
N, D, M = 11, 2, 5
X = rng.randn(N, D)
Y = np.sin(X[:, :1]) + 0.1 * rng.randn(N, 1)
Z = rng.randn(M, D)
XT = rng.randn(6, D)


_QMU_SVGP = rng.randn(M, 1)
_QMU_VGP = rng.randn(N, 1)


def _make_model(name):
    """Fresh model per call — tests must not share mutable model state."""
    if name == "GPR":
        return GPR((X, Y), kernel=kernels.SquaredExponential())
    if name == "SGPR":
        return SGPR((X, Y), kernel=kernels.SquaredExponential(), inducing_variable=Z.copy())
    if name == "SVGP":
        m = SVGP(
            kernel=kernels.SquaredExponential(),
            likelihood=likelihoods.Gaussian(0.1),
            inducing_variable=Z.copy(),
        )
        m.q_mu.assign(_QMU_SVGP)  # nonzero variational state
        return m
    if name == "VGP":
        m = VGP((X, Y), kernel=kernels.SquaredExponential(), likelihood=likelihoods.Gaussian(0.1))
        m.q_mu.assign(_QMU_VGP)
        return m
    raise ValueError(name)


MODEL_NAMES = ["GPR", "SGPR", "SVGP", "VGP"]


@pytest.mark.parametrize("name", MODEL_NAMES)
@pytest.mark.parametrize("full_cov", [False, True])
def test_posterior_matches_model_predict(name, full_cov):
    model = _make_model(name)
    post = model.posterior()
    mu_m, var_m = model.predict_f(XT, full_cov=full_cov)
    mu_p, var_p = post.predict_f(XT, full_cov=full_cov)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_m), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_m), atol=1e-8)


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_posterior_stale_then_refreshed(name):
    model = _make_model(name)
    post = model.posterior()
    mu_before, _ = (np.asarray(a) for a in post.predict_f(XT))

    model.kernel.lengthscales.assign(0.3)
    # fused prediction reflects the new hyperparameters immediately
    mu_new, _ = (np.asarray(a) for a in model.predict_f(XT))
    assert not np.allclose(mu_new, mu_before)
    # the cached posterior is now INCONSISTENT (live-kernel Kuf against the
    # stale cached factors — same semantics as the reference); update_cache
    # restores agreement with the fused prediction
    post.update_cache(PrecomputeCacheType.TENSOR)
    mu_fresh, _ = (np.asarray(a) for a in post.predict_f(XT))
    np.testing.assert_allclose(mu_fresh, mu_new, atol=1e-8)


def test_gpr_posterior_nocache_raises():
    m = GPR((X, Y), kernel=kernels.SquaredExponential())
    post = m.posterior(PrecomputeCacheType.NOCACHE)
    with pytest.raises(ValueError):
        post.predict_f(XT)
    mu, var = post.fused_predict_f(XT)
    mu_m, var_m = m.predict_f(XT)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_m), atol=1e-9)
