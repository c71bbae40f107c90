"""BayesianGPLVM float32 robustness: the f32 psi2 projection must be PSD
(no NaN Cholesky) and match the f64 bound closely at evaluation."""
import jax
import jax.numpy as jnp
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.models import BayesianGPLVM
from gpflow_tpu.utilities.ops import pca_reduce

rng = np.random.RandomState(0)
N, Q, D, M = 200, 2, 6, 32
t = rng.randn(N, Q)
Y64 = np.tanh(t @ rng.randn(Q, D)) + 0.05 * rng.randn(N, D)


def _model(dtype):
    Y = Y64.astype(dtype)
    Xinit = np.asarray(pca_reduce(Y, Q)).astype(dtype)
    return BayesianGPLVM(
        Y,
        X_data_mean=Xinit,
        X_data_var=np.full((N, Q), 0.1, dtype),
        kernel=gpf.kernels.SquaredExponential(lengthscales=np.ones(Q, dtype)),
        num_inducing_variables=M,
    )


def test_f32_elbo_finite_and_close_to_f64():
    with gpf.config.as_context(
        gpf.config.Config(float=np.float32, jitter=1e-4)
    ):
        m32 = _model(np.float32)
        l32 = float(m32.training_loss())
        g = jax.grad(
            lambda u: _swap_loss(m32, u)
        )(tuple(p._unconstrained for p in m32.trainable_parameters))
    m64 = _model(np.float64)
    l64 = float(m64.training_loss())
    assert np.isfinite(l32)
    # jitter differs (1e-4 vs 1e-6) and precision differs: generous tolerance
    assert abs(l32 - l64) / abs(l64) < 0.05
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


def _swap_loss(model, unc):
    params = list(model.trainable_parameters)
    old = [p._unconstrained for p in params]
    try:
        for p, u in zip(params, unc):
            p._unconstrained = u
        return model.training_loss()
    finally:
        for p, o in zip(params, old):
            p._unconstrained = o
