"""Prediction-surface grid over every model family (patterns from
reference ``tests/gpflow/models/test_methods.py`` and
``test_model_predict.py``): shapes of predict_f / predict_y /
predict_f_samples / predict_log_density across full_cov, plus internal
consistency (predict_y variance >= predict_f variance; samples scatter
around predict_f mean)."""
import numpy as np
import pytest

import gpflow_tpu as gpf
from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.models import (
    CGLB,
    GPMC,
    GPR,
    GPRFITC,
    SGPMC,
    SGPR,
    SVGP,
    VGP,
    VGPOpperArchambeau,
)

rng = np.random.RandomState(17)
N, D, M, P = 14, 2, 6, 1
X = rng.randn(N, D)
Y = np.sin(X[:, :1]) + 0.1 * rng.randn(N, P)
Z = rng.randn(M, D)
XT = rng.randn(5, D)


def _kern():
    return kernels.SquaredExponential(lengthscales=0.8)


def _models():
    return [
        ("GPR", GPR((X, Y), kernel=_kern())),
        ("SGPR", SGPR((X, Y), kernel=_kern(), inducing_variable=Z.copy())),
        ("GPRFITC", GPRFITC((X, Y), kernel=_kern(), inducing_variable=Z.copy())),
        (
            "SVGP",
            SVGP(kernel=_kern(), likelihood=likelihoods.Gaussian(0.1), inducing_variable=Z.copy()),
        ),
        ("VGP", VGP((X, Y), kernel=_kern(), likelihood=likelihoods.Gaussian(0.1))),
        (
            "VGPOpperArchambeau",
            VGPOpperArchambeau((X, Y), kernel=_kern(), likelihood=likelihoods.Gaussian(0.1)),
        ),
        ("CGLB", CGLB((X, Y), kernel=_kern(), inducing_variable=Z.copy())),
        ("GPMC", GPMC((X, Y), kernel=_kern(), likelihood=likelihoods.Gaussian(0.1))),
        (
            "SGPMC",
            SGPMC(
                (X, Y),
                kernel=_kern(),
                likelihood=likelihoods.Gaussian(0.1),
                inducing_variable=Z.copy(),
            ),
        ),
    ]


MODELS = _models()


@pytest.mark.parametrize("name,model", MODELS, ids=[n for n, _ in MODELS])
def test_predict_f_shapes(name, model):
    mu, var = model.predict_f(XT)
    assert mu.shape == (5, P) and var.shape == (5, P)
    assert np.isfinite(np.asarray(mu)).all() and (np.asarray(var) > -1e-10).all()

    mu_fc, var_fc = model.predict_f(XT, full_cov=True)
    np.testing.assert_allclose(np.asarray(mu_fc), np.asarray(mu), atol=1e-8)
    assert var_fc.shape == (P, 5, 5)
    np.testing.assert_allclose(
        np.asarray(var_fc)[0].diagonal(), np.asarray(var)[:, 0], atol=1e-7
    )


@pytest.mark.parametrize("name,model", MODELS, ids=[n for n, _ in MODELS])
def test_predict_y_adds_noise(name, model):
    mu_f, var_f = model.predict_f(XT)
    mu_y, var_y = model.predict_y(XT)
    np.testing.assert_allclose(np.asarray(mu_y), np.asarray(mu_f), atol=1e-7)
    assert (np.asarray(var_y) >= np.asarray(var_f) - 1e-12).all()


@pytest.mark.parametrize("name,model", MODELS, ids=[n for n, _ in MODELS])
def test_predict_f_samples(name, model):
    S = 1000
    samples = np.asarray(model.predict_f_samples(XT, num_samples=S))
    assert samples.shape == (S, 5, P)
    mu, var = (np.asarray(a) for a in model.predict_f(XT))
    np.testing.assert_allclose(samples.mean(0), mu, atol=4 * np.sqrt(var.max() / S) + 0.1)

    s_fc = np.asarray(model.predict_f_samples(XT, num_samples=3, full_cov=True))
    assert s_fc.shape == (3, 5, P)


@pytest.mark.parametrize("name,model", MODELS, ids=[n for n, _ in MODELS])
def test_predict_log_density(name, model):
    Yt = rng.randn(5, P)
    ld = np.asarray(model.predict_log_density((XT, Yt)))
    assert ld.shape == (5,)
    assert np.isfinite(ld).all()
    # manual check against the Gaussian formula
    mu, var = (np.asarray(a) for a in model.predict_f(XT))
    noise = float(model.likelihood.variance.value)
    tot = var + noise
    expected = (-0.5 * np.log(2 * np.pi * tot) - 0.5 * (Yt - mu) ** 2 / tot).sum(-1)
    np.testing.assert_allclose(ld, expected, atol=1e-6)


def test_maximum_log_likelihood_objective_finite():
    for name, model in MODELS:
        if name == "SVGP":
            obj = float(model.maximum_log_likelihood_objective((X, Y)))
        else:
            obj = float(model.maximum_log_likelihood_objective())
        assert np.isfinite(obj), name
