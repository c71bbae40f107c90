"""Mean-function behavior and composition (pattern from reference
``tests/gpflow/test_functions.py``)."""
import numpy as np
import pytest

from gpflow_tpu import functions

rng = np.random.RandomState(9)
N, D, P = 10, 3, 2
X = rng.randn(N, D)


def test_zero_and_constant():
    assert np.all(np.asarray(functions.Zero(output_dim=P)(X)) == 0.0)
    c = functions.Constant(c=np.array([1.5, -2.0]))
    out = np.asarray(c(X))
    assert out.shape == (N, 2)
    np.testing.assert_allclose(out, np.broadcast_to([1.5, -2.0], (N, 2)))


def test_linear_and_identity():
    A = rng.randn(D, P)
    b = rng.randn(P)
    f = functions.Linear(A=A, b=b)
    np.testing.assert_allclose(np.asarray(f(X)), X @ A + b, atol=1e-10)

    ident = functions.Identity()
    np.testing.assert_allclose(np.asarray(ident(X)), X, atol=1e-12)


def test_polynomial_degree_zero_is_constant():
    w = np.array([[0.7]])
    p = functions.Polynomial(degree=0, input_dim=D, output_dim=1, w=w.ravel())
    np.testing.assert_allclose(np.asarray(p(X)), np.full((N, 1), 0.7), atol=1e-12)


def test_polynomial_matches_manual():
    p = functions.Polynomial(degree=2, input_dim=1, output_dim=1)
    x = rng.randn(N, 1)
    # default weights: [1, 0, 0] -> constant 1
    np.testing.assert_allclose(np.asarray(p(x)), np.ones((N, 1)), atol=1e-12)
    p.w.assign(np.array([[1.0, 2.0, 3.0]]))  # 1 + 2x + 3x^2
    np.testing.assert_allclose(np.asarray(p(x)), 1 + 2 * x + 3 * x ** 2, atol=1e-9)


def test_additive_and_product_composition():
    A = rng.randn(D, 1)
    f1 = functions.Linear(A=A)
    f2 = functions.Constant(c=np.array([2.0]))

    add = f1 + f2
    assert isinstance(add, functions.Additive)
    np.testing.assert_allclose(np.asarray(add(X)), X @ A + 2.0, atol=1e-9)

    prod = f1 * f2
    assert isinstance(prod, functions.Product)
    np.testing.assert_allclose(np.asarray(prod(X)), (X @ A) * 2.0, atol=1e-9)


def test_switched_mean_function():
    f = functions.SwitchedMeanFunction(
        [functions.Constant(c=np.array([1.0])), functions.Constant(c=np.array([5.0]))]
    )
    idx = rng.randint(0, 2, (N, 1)).astype(float)
    Xs = np.concatenate([rng.randn(N, 1), idx], axis=1)
    out = np.asarray(f(Xs))
    expected = np.where(idx == 0, 1.0, 5.0)
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_mean_function_in_model_predictions():
    import gpflow_tpu as gpf

    X1 = rng.rand(20, 1)
    Y1 = 3.0 * X1 + 1.0 + 0.01 * rng.randn(20, 1)
    m = gpf.models.GPR(
        (X1, Y1),
        kernel=gpf.kernels.SquaredExponential(),
        mean_function=functions.Linear(A=np.ones((1, 1))),
        noise_variance=0.01,
    )
    gpf.optimizers.Scipy().minimize(
        m.training_loss, m.trainable_variables, options={"maxiter": 100}
    )
    far = np.array([[10.0]])  # far from data: posterior reverts to the mean fn
    mu, _ = m.predict_f(far)
    expected = float(m.mean_function(far)[0, 0])
    np.testing.assert_allclose(float(mu[0, 0]), expected, rtol=0.2)
