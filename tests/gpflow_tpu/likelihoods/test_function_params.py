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


# --- monotonicity grid over input-dependent parameters (reference
# ``test_function_params.py:30-221``): with a likelihood parameter that is a
# Linear function of X's first feature, every statistic must move in the
# documented direction along N for positive X, and stay CONSTANT for negative
# X (the lower-bound clamp kicks in).

_B = (1, 2)
_N, _D, _Q = 5, 3, 2
_r2 = np.random.RandomState(20220623)
_X_pos = _r2.rand(*_B, _N, _D)
_X_pos[:, :, :, 0] = np.linspace(0.1, 1.0, _N)[None, None, :]
_X_neg = -_r2.rand(*_B, _N, _D)
_F2 = 0.5 * np.ones((*_B, _N, _Q))
_Fmu2 = 0.5 * np.ones((*_B, _N, _Q))
_Fvar2 = 0.1 * np.ones((*_B, _N, _Q))
_Y2 = 0.5 * np.ones((*_B, _N, _Q))


def _linear_fn():
    return Linear(A=np.array([[1.0, 1.0], [0.0, 0.0], [0.0, 0.0]]), b=np.zeros(2))


def _diff(x, axis):
    return np.diff(np.asarray(x), axis=axis)


def assert_decreasing(x, axis):
    assert (_diff(x, axis) < 0).all(), x


def assert_increasing(x, axis):
    assert (_diff(x, axis) > 0).all(), x


def assert_constant(x, axis):
    np.testing.assert_allclose(_diff(x, axis), 0.0, atol=1e-12)


def no_assert(x, axis):
    pass


FN_SETUPS = [
    ("gaussian_variance", lambda: likelihoods.Gaussian(variance=_linear_fn()),
     assert_decreasing, assert_constant, assert_increasing, assert_decreasing),
    ("gaussian_scale", lambda: likelihoods.Gaussian(scale=_linear_fn()),
     assert_decreasing, assert_constant, assert_increasing, no_assert),
    ("student_t", lambda: likelihoods.StudentT(scale=_linear_fn()),
     assert_decreasing, assert_constant, assert_increasing, no_assert),
    ("gamma", lambda: likelihoods.Gamma(shape=_linear_fn()),
     no_assert, assert_increasing, assert_increasing, no_assert),
    ("beta", lambda: likelihoods.Beta(scale=_linear_fn()),
     no_assert, assert_constant, assert_decreasing, assert_increasing),
]
_IDS = [s[0] for s in FN_SETUPS]


@pytest.mark.parametrize("name,make,lp_assert,m_assert,v_assert,ve_assert", FN_SETUPS, ids=_IDS)
def test_function_param_log_prob_monotonicity(name, make, lp_assert, m_assert, v_assert, ve_assert):
    lik = make()
    lp_assert(lik.log_prob(_X_pos, _F2, _Y2), -1)
    assert_constant(lik.log_prob(_X_neg, _F2, _Y2), -1)


@pytest.mark.parametrize("name,make,lp_assert,m_assert,v_assert,ve_assert", FN_SETUPS, ids=_IDS)
def test_function_param_conditional_moments_monotonicity(
    name, make, lp_assert, m_assert, v_assert, ve_assert
):
    lik = make()
    m_assert(lik.conditional_mean(_X_pos, _F2), -2)
    assert_constant(lik.conditional_mean(_X_neg, _F2), -2)
    v_assert(lik.conditional_variance(_X_pos, _F2), -2)
    assert_constant(lik.conditional_variance(_X_neg, _F2), -2)


@pytest.mark.parametrize("name,make,lp_assert,m_assert,v_assert,ve_assert", FN_SETUPS, ids=_IDS)
def test_function_param_predictions_monotonicity(
    name, make, lp_assert, m_assert, v_assert, ve_assert
):
    lik = make()
    mu, var = lik.predict_mean_and_var(_X_pos, _Fmu2, _Fvar2)
    m_assert(mu, -2)
    v_assert(var, -2)
    mu_n, var_n = lik.predict_mean_and_var(_X_neg, _Fmu2, _Fvar2)
    assert_constant(mu_n, -2)
    assert_constant(var_n, -2)

    lp_assert(lik.predict_log_density(_X_pos, _Fmu2, _Fvar2, _Y2), -1)
    assert_constant(lik.predict_log_density(_X_neg, _Fmu2, _Fvar2, _Y2), -1)

    ve_assert(lik.variational_expectations(_X_pos, _Fmu2, _Fvar2, _Y2), -1)
    assert_constant(lik.variational_expectations(_X_neg, _Fmu2, _Fvar2, _Y2), -1)
