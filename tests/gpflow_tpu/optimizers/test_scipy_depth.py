"""Scipy optimizer depth tests (reference ``tests/gpflow/optimizers/test_scipy.py``:
optimal-convergence ``:137-161``, partially-disconnected variables ``:164-183``,
pack/unpack round trips, deep-copyability ``:550-579``)."""
import copy

import numpy as np
import pytest

import gpflow_tpu
from gpflow_tpu import Parameter, kernels, set_trainable
from gpflow_tpu.models import GPR
from gpflow_tpu.optimizers import Scipy


class Datum:
    rng = np.random.RandomState(0)
    X = rng.rand(20, 1)
    Y = 0.5 * X + rng.randn(20, 1) * 0.01


def _model():
    return GPR(
        (Datum.X, Datum.Y),
        kernel=kernels.SquaredExponential(),
        noise_variance=0.01,
    )


@pytest.mark.parametrize("compile_", [True, False])
def test_scipy_optimal(compile_):
    """At convergence the gradient is ~0 and predictions recover the data
    (reference ``test_scipy.py:137-161``)."""
    model = _model()
    opt = Scipy()
    res = opt.minimize(
        model.training_loss,
        model.trainable_variables,
        compile=compile_,
        options=dict(maxiter=500),
    )
    assert res.success
    # gradient at the optimum ~ 0 (scipy reports the last jac)
    np.testing.assert_allclose(res.jac, 0.0, atol=1e-3)
    mu, _ = model.predict_f(Datum.X)
    np.testing.assert_allclose(np.asarray(mu), Datum.Y, atol=0.05)


def test_scipy_partially_disconnected_variable():
    """A parameter only partially entering the loss is NOT unused
    (reference ``test_scipy.py:164-183``)."""
    model = _model()
    # replace the mean function with a 2-vector of which only element 0
    # enters the loss
    theta = Parameter(np.array([0.5, 1.5]))

    def closure():
        m = model.training_loss()
        return m + (theta.value[0] - 1.0) ** 2

    opt = Scipy()
    res = opt.minimize(
        closure, list(model.trainable_variables) + [theta], options=dict(maxiter=100)
    )
    assert res.success
    np.testing.assert_allclose(np.asarray(theta.value)[0], 1.0, atol=1e-3)
    # untouched element keeps its initial value
    np.testing.assert_allclose(np.asarray(theta.value)[1], 1.5, rtol=1e-12)


@pytest.mark.parametrize("method", ["BFGS", "CG", "TNC"])
def test_scipy_alternate_methods(method):
    model = _model()
    loss0 = float(model.training_loss())
    options = dict(maxfun=50) if method == "TNC" else dict(maxiter=25)
    Scipy().minimize(
        model.training_loss,
        model.trainable_variables,
        method=method,
        options=options,
    )
    assert float(model.training_loss()) < loss0


def test_pack_unpack_roundtrip_with_triangular():
    """pack_tensors/unpack_tensors/assign_tensors round-trip the minimize
    vector layout, incl. tril-packed q_sqrt (reference ``scipy.py:292-319``)."""
    from gpflow_tpu.models import SVGP

    rng = np.random.RandomState(1)
    model = SVGP(
        kernel=kernels.SquaredExponential(),
        likelihood=gpflow_tpu.likelihoods.Gaussian(0.1),
        inducing_variable=rng.randn(5, 1),
        num_data=10,
    )
    variables = model.trainable_variables
    vec = Scipy.pack_tensors(variables)
    assert vec.ndim == 1
    # same layout as initial_parameters
    np.testing.assert_allclose(vec, Scipy().initial_parameters(variables), rtol=1e-12)
    parts = Scipy.unpack_tensors(variables, vec)
    for v, p in zip(variables, parts):
        np.testing.assert_allclose(
            np.asarray(v.unconstrained_variable), p, rtol=1e-12
        )
    # perturb, assign, re-pack
    vec2 = vec + 0.25
    parts2 = Scipy.unpack_tensors(variables, vec2)
    Scipy.assign_tensors(variables, parts2)
    repacked = Scipy.pack_tensors(variables)
    np.testing.assert_allclose(repacked, vec2, rtol=1e-12)


def test_assign_tensors_length_mismatch_raises():
    theta = Parameter(1.0)
    with pytest.raises(ValueError, match="same length"):
        Scipy.assign_tensors([theta], [np.zeros(1), np.zeros(1)])


def test_scipy_deep_copyable():
    """The optimizer object survives deepcopy before and after a minimize
    (reference ``test_scipy.py:550-579``)."""
    opt = Scipy()
    opt2 = copy.deepcopy(opt)
    model = _model()
    opt2.minimize(model.training_loss, model.trainable_variables, options=dict(maxiter=5))
    opt3 = copy.deepcopy(opt2)
    res = opt3.minimize(
        model.training_loss, model.trainable_variables, options=dict(maxiter=5)
    )
    assert np.isfinite(res.fun)


def test_repeated_minimize_continues_from_assigned_optimum():
    """minimize assigns the optimum back; a second call starts there."""
    model = _model()
    opt = Scipy()
    r1 = opt.minimize(
        model.training_loss, model.trainable_variables, options=dict(maxiter=200)
    )
    r2 = opt.minimize(
        model.training_loss, model.trainable_variables, options=dict(maxiter=200)
    )
    assert r2.fun <= r1.fun + 1e-8
    assert r2.nit <= r1.nit  # warm start: at/near the optimum already


def test_fixed_variables_respected_via_set_trainable():
    model = _model()
    set_trainable(model.kernel.lengthscales, False)
    before = float(model.kernel.lengthscales.numpy())
    Scipy().minimize(
        model.training_loss, model.trainable_variables, options=dict(maxiter=50)
    )
    assert float(model.kernel.lengthscales.numpy()) == before
