"""Input-dependent likelihood parameters (pattern from reference
``tests/gpflow/likelihoods/test_function_params.py``): a Gaussian
likelihood whose variance/scale is a ``Function`` must agree with the
constant-parameter likelihood when the function is constant, and must
actually vary with X otherwise."""
import numpy as np
import pytest

from gpflow_tpu import likelihoods
from gpflow_tpu.functions import Constant, Linear

rng = np.random.RandomState(29)
N = 8
X = np.abs(rng.randn(N, 2)) + 0.1
F = rng.randn(N, 1)
FVAR = np.abs(rng.randn(N, 1)) + 0.2
Y = rng.randn(N, 1)

CONST = 0.4


@pytest.fixture
def lik_const():
    return likelihoods.Gaussian(CONST)


@pytest.fixture
def lik_fn():
    return likelihoods.Gaussian(variance=Constant(np.array([CONST])))


METHODS = [
    ("log_prob", lambda l: l.log_prob(X, F, Y)),
    ("conditional_variance", lambda l: l.conditional_variance(X, F)),
    ("predict_mean_and_var", lambda l: l.predict_mean_and_var(X, F, FVAR)[1]),
    ("predict_log_density", lambda l: l.predict_log_density(X, F, FVAR, Y)),
    ("variational_expectations", lambda l: l.variational_expectations(X, F, FVAR, Y)),
]


@pytest.mark.parametrize("name,fn", METHODS, ids=[n for n, _ in METHODS])
def test_constant_function_equals_constant_parameter(name, fn, lik_const, lik_fn):
    np.testing.assert_allclose(
        np.asarray(fn(lik_fn)), np.asarray(fn(lik_const)), rtol=1e-6
    )


def test_variance_at_varies_with_input():
    lik = likelihoods.Gaussian(variance=Linear(A=np.ones((2, 1)), b=np.full(1, 0.1)))
    v = np.asarray(lik.variance_at(X))
    expected = X.sum(-1, keepdims=True) + 0.1
    np.testing.assert_allclose(v, expected, rtol=1e-6)
    # log densities then differ point-to-point exactly per the local variance
    lp = np.asarray(lik.log_prob(X, F, Y))
    from scipy import stats

    expected_lp = stats.norm.logpdf(Y, F, np.sqrt(expected)).sum(-1)
    np.testing.assert_allclose(lp, expected_lp, rtol=1e-6)


def test_scale_parameterization_matches_variance():
    lik_var = likelihoods.Gaussian(variance=CONST)
    lik_scale = likelihoods.Gaussian(scale=np.sqrt(CONST))
    np.testing.assert_allclose(
        np.asarray(lik_scale.log_prob(X, F, Y)),
        np.asarray(lik_var.log_prob(X, F, Y)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(lik_scale.variance_at(X)), np.asarray(lik_var.variance_at(X)), rtol=1e-6
    )


def test_variance_and_scale_both_given_raises():
    with pytest.raises((ValueError, TypeError)):
        likelihoods.Gaussian(variance=0.3, scale=0.5)
