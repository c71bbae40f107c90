"""Mean-function depth tests (reference ``tests/gpflow/test_functions.py``):
output-shape/composite-type grid ``:60-117``, distributive/inverse/associative
algebra ``:129-200``, switched oracle ``:254-266``, bug-277 regression
``:269-275``, and the all-model mean-function effect sweep ``:278-375``."""
import numpy as np
import pytest

import gpflow_tpu
from gpflow_tpu.functions import (
    Additive,
    Constant,
    Linear,
    MeanFunction,
    Polynomial,
    Product,
    SwitchedMeanFunction,
    Zero,
)
from gpflow_tpu.inducing_variables import InducingPoints

rng = np.random.RandomState(99)


class Datum:
    input_dim, output_dim = 3, 2
    N, Ntest, M = 20, 30, 10


def _mean_functions():
    return [
        Zero(),
        Linear(
            A=rng.randn(Datum.input_dim, Datum.output_dim),
            b=rng.randn(Datum.output_dim),
        ),
        Constant(c=rng.randn(Datum.output_dim)),
        Polynomial(degree=2, input_dim=Datum.input_dim, output_dim=Datum.output_dim),
    ]


@pytest.mark.parametrize("i", range(4))
@pytest.mark.parametrize("j", range(4))
@pytest.mark.parametrize("operation", ["+", "*"])
def test_mean_functions_output_shape_and_composite_type(i, j, operation):
    mf1, mf2 = _mean_functions()[i], _mean_functions()[j]
    X = rng.randn(Datum.N, Datum.input_dim)
    assert np.asarray(mf1(X)).shape in [(Datum.N, Datum.output_dim), (Datum.N, 1)]
    composed = mf1 + mf2 if operation == "+" else mf1 * mf2
    assert isinstance(composed, Additive if operation == "+" else Product)
    assert np.asarray(composed(X)).shape in [(Datum.N, Datum.output_dim), (Datum.N, 1)]


def _linears(n=3):
    fns = [
        Linear(
            A=rng.randn(Datum.input_dim, Datum.output_dim),
            b=rng.randn(Datum.output_dim),
        )
        for _ in range(n)
    ]
    fns.append(Linear(A=-1.0 * fns[0].A.numpy(), b=-1.0 * fns[0].b.numpy()))
    return fns


def _constants(n=3):
    fns = [Constant(c=rng.randn(Datum.output_dim)) for _ in range(n)]
    fns.append(Constant(c=-1.0 * fns[0].c.numpy()))
    return fns


@pytest.mark.parametrize("factory", [_linears, _constants])
def test_mean_functions_distributive_property(factory):
    """A * (B + C) == A * B + A * C pointwise (reference ``:129-149``)."""
    A, B, C, _ = factory()
    X = rng.randn(Datum.Ntest, Datum.input_dim)
    lhs = (A * (B + C))(X)
    rhs = (A * B + A * C)(X)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-12)


@pytest.mark.parametrize("factory", [_linears, _constants])
def test_mean_functions_A_minus_A_equals_zero(factory):
    """fns[0] + fns[-1] (its negation) == Zero (reference ``:151-170``)."""
    fns = factory()
    X = rng.randn(Datum.Ntest, Datum.input_dim)
    np.testing.assert_allclose(
        np.asarray((fns[0] + fns[-1])(X)), 0.0, atol=1e-12
    )


def test_linear_mean_functions_associative_property():
    """A + (B + C) == (A + B) + C (reference ``:173-200``)."""
    A, B, C, _ = _linears()
    X = rng.randn(Datum.Ntest, Datum.input_dim)
    np.testing.assert_allclose(
        np.asarray((A + (B + C))(X)), np.asarray(((A + B) + C)(X)), rtol=1e-12
    )


@pytest.mark.parametrize("N,D", [(10, 3), (7, 1)])
def test_switched_mean_function_oracle(N, D):
    X = np.hstack([rng.randn(N, D), 1.0 * rng.randint(0, 2, N).reshape(-1, 1)])
    switched = SwitchedMeanFunction([Constant(np.zeros(1)), Constant(np.ones(1))])
    expected = np.array([0.0, 1.0])[X[:, D].astype(int)].reshape(-1, 1)
    np.testing.assert_allclose(np.asarray(switched(X)), expected, rtol=1e-12)


def test_bug_277_regression():
    """Two Linear() instances must not share default-parameter state
    (reference ``:269-275``, github gpflow issue #277)."""
    m1, m2 = Linear(), Linear()
    assert m1.b.numpy() == m2.b.numpy()
    m2.b.assign(np.asarray([1.0]))
    assert not m1.b.numpy() == m2.b.numpy()


_MODEL_CLASSES = ["GPR", "SGPR", "GPRFITC", "SVGP", "VGP", "GPMC", "SGPMC"]


@pytest.mark.parametrize("model_name", _MODEL_CLASSES)
def test_models_with_mean_functions_changes(model_name):
    """A +10 constant mean must raise every model's predictions vs a zero
    mean; adding Zero / multiplying by one must not change them
    (reference ``:278-375``)."""
    models = gpflow_tpu.models
    data = (rng.randn(Datum.N, Datum.input_dim), rng.randn(Datum.N, 1))
    Xnew = rng.randn(Datum.Ntest, Datum.input_dim)
    iv = InducingPoints(rng.randn(Datum.M, Datum.input_dim))
    kernel = gpflow_tpu.kernels.Matern32()
    likelihood = gpflow_tpu.likelihoods.Gaussian()
    zero_mean, big_mean = Zero(), Constant(c=np.ones(1) * 10.0)
    one = Constant(c=np.ones(1))

    def build(mean):
        cls = getattr(models, model_name)
        if model_name == "GPR":
            return cls(data, kernel=kernel, mean_function=mean)
        if model_name in ("SGPR", "GPRFITC"):
            return cls(data, kernel=kernel, inducing_variable=iv, mean_function=mean)
        if model_name == "SVGP":
            return cls(
                kernel=kernel, likelihood=likelihood, inducing_variable=iv,
                mean_function=mean, num_data=Datum.N,
            )
        if model_name == "VGP":
            return cls(data, kernel=kernel, likelihood=likelihood, mean_function=mean)
        if model_name == "GPMC":
            return cls(data, kernel=kernel, likelihood=likelihood, mean_function=mean)
        return cls(
            data, kernel=kernel, likelihood=likelihood, inducing_variable=iv,
            mean_function=mean,
        )

    mu_zero, _ = build(zero_mean).predict_f(Xnew)
    mu_big, _ = build(big_mean).predict_f(Xnew)
    # the +10 mean must raise predictions overall (pointwise strictness is
    # seed-dependent: smoother weights can exceed 1 at isolated points, which
    # flips the shift's sign there even for exact GPR)
    assert np.mean(np.asarray(mu_big) - np.asarray(mu_zero)) > 1.0
    assert np.mean(np.asarray(mu_big) > np.asarray(mu_zero)) > 0.7

    # additive zero / multiplicative one leave predictions unchanged
    mu_plus_zero, _ = build(big_mean + zero_mean).predict_f(Xnew)
    np.testing.assert_allclose(np.asarray(mu_big), np.asarray(mu_plus_zero), atol=1e-9)
    mu_times_one, _ = build(Product(big_mean, one)).predict_f(Xnew)
    np.testing.assert_allclose(np.asarray(mu_big), np.asarray(mu_times_one), atol=1e-9)
