"""Natural-gradient step rejection: a step that leaves the negative-definite
cone must keep (q_mu, q_sqrt) unchanged instead of propagating NaN."""
import jax.numpy as jnp
import numpy as np

from gpflow_tpu.bijectors import Identity, triangular
from gpflow_tpu.optimizers.natgrad import NaturalGradient
from gpflow_tpu.quadrature import NDiagGHQuadrature


def _values(gamma, q_sqrt_grad_scale):
    M = 4
    q_mu = jnp.zeros((M, 1))
    q_sqrt = jnp.eye(M)[None]
    # a large positive gradient on q_sqrt drives nat2_new indefinite
    g_mu = jnp.ones((M, 1))
    g_sqrt = q_sqrt_grad_scale * jnp.tile(jnp.eye(M)[None], (1, 1, 1))
    ng = NaturalGradient(gamma=gamma)
    mu_t, sq_t = Identity(), triangular()
    return q_mu, q_sqrt, ng._natgrad_values(
        g_mu, g_sqrt, q_mu, q_sqrt, mu_t, sq_t, ng.xi_transform
    )


def test_sane_step_accepted():
    q_mu, q_sqrt, (mean_new, varsqrt_new) = _values(0.1, 0.1)
    assert np.isfinite(mean_new).all() and np.isfinite(varsqrt_new).all()
    assert np.abs(np.asarray(mean_new)).max() > 1e-3  # actually moved


def test_cone_exit_rejected():
    # a large negative q_sqrt gradient turns nat2 - gamma * dL/deta2
    # indefinite: the conversion Cholesky is NaN, and the guard must return
    # the inputs unchanged.
    q_mu, q_sqrt, (mean_new, varsqrt_new) = _values(1.0, -100.0)
    assert np.isfinite(mean_new).all() and np.isfinite(varsqrt_new).all()
    np.testing.assert_array_equal(np.asarray(mean_new), np.asarray(q_mu))
    np.testing.assert_array_equal(np.asarray(varsqrt_new), np.asarray(q_sqrt))


def test_quadrature_clamps_negative_variance():
    # reduced-precision matmul modes can round predictive variance slightly
    # negative; the quadrature grid must degrade to the mean, not NaN
    quad = NDiagGHQuadrature(dim=1, n_gh=5)
    mean = jnp.array([[0.7]])
    var = jnp.array([[-1e-3]])
    X, W = quad._build_X_W(mean, var)
    assert np.isfinite(np.asarray(X)).all()
    np.testing.assert_allclose(np.asarray(X), 0.7)
