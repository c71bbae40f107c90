"""ops.linalg custom-VJP composites must match stock autodiff exactly (f64)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import solve_triangular

from gpflow_tpu.ops.linalg import chol_and_inverse, triangular_inverse

rng = np.random.RandomState(0)


def _spd(m, batch=()):
    a = rng.randn(*batch, m, m)
    return jnp.asarray(a @ np.swapaxes(a, -1, -2) + m * np.eye(m))


@pytest.mark.parametrize("m", [5, 17])
def test_triangular_inverse_matches_solve(m):
    L = jnp.linalg.cholesky(_spd(m))
    np.testing.assert_allclose(
        np.asarray(triangular_inverse(L)),
        np.asarray(solve_triangular(L, jnp.eye(m), lower=True)),
        rtol=1e-12,
    )


@pytest.mark.parametrize("m", [5, 17])
def test_triangular_inverse_grad_matches_autodiff(m):
    L = jnp.linalg.cholesky(_spd(m))
    f_ref = lambda l: jnp.sum(jnp.sin(solve_triangular(l, jnp.eye(m), lower=True)))
    f_new = lambda l: jnp.sum(jnp.sin(triangular_inverse(l)))
    g_ref = jnp.tril(jax.grad(f_ref)(L))  # only the lower triangle is read
    g_new = jax.grad(f_new)(L)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_new), atol=1e-12)


@pytest.mark.parametrize("batch", [(), (3,)])
def test_chol_and_inverse_grad_matches_autodiff(batch):
    m = 8
    K = _spd(m, batch)
    eye = jnp.eye(m)

    def h_ref(k):
        L = jnp.linalg.cholesky(k)
        Li = solve_triangular(L, jnp.broadcast_to(eye, L.shape), lower=True)
        return jnp.sum(jnp.sin(L) * 1.3) + jnp.sum(jnp.cos(Li) * 0.7)

    def h_new(k):
        L, Li = chol_and_inverse(k)
        return jnp.sum(jnp.sin(L) * 1.3) + jnp.sum(jnp.cos(Li) * 0.7)

    np.testing.assert_allclose(np.asarray(h_ref(K)), np.asarray(h_new(K)), rtol=1e-12)
    g_ref, g_new = jax.grad(h_ref)(K), jax.grad(h_new)(K)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_new), atol=1e-12)
