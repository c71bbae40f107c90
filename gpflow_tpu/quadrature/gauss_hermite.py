"""N-dimensional diagonal Gauss-Hermite quadrature (reference
``/root/reference/gpflow/quadrature/gauss_hermite.py:30-154``)."""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utilities.shapes import check_shapes, inherit_check_shapes
from .base import GaussianQuadrature

__all__ = [
    "NDiagGHQuadrature",
    "gh_points_and_weights",
    "list_to_flat_grid",
    "ndgh_points_and_weights",
    "repeat_as_list",
    "reshape_Z_dZ",
]


@check_shapes(
    "xs[all]: [.]",
    "return: [N_product, D]",
)
def list_to_flat_grid(xs: Sequence[np.ndarray]) -> np.ndarray:
    """Flatten a list of d rank-1 arrays (lengths N1..Nd) into the
    [N1*...*Nd, d] grid of all combinations (reference
    ``gauss_hermite.py:49-60``; same 'xy' meshgrid point ordering)."""
    return np.reshape(np.stack(np.meshgrid(*xs), axis=-1), (-1, len(xs)))


@check_shapes(
    "zs[all]: [.]",
    "dzs[all]: [.]",
    "return[0]: [N_product, D]",
    "return[1]: [N_product, 1]",
)
def reshape_Z_dZ(
    zs: Sequence[np.ndarray], dzs: Sequence[np.ndarray]
) -> Tuple[np.ndarray, np.ndarray]:
    """Combine per-dimension points/weights into grid points Z
    [N_product, d] and product weights dZ [N_product, 1] (reference
    ``gauss_hermite.py:62-77``)."""
    Z = list_to_flat_grid(zs)
    dZ = np.prod(list_to_flat_grid(dzs), axis=-1, keepdims=True)
    return Z, dZ


@check_shapes(
    "x: [any...]",
    "return[all]: [any...]",
)
def repeat_as_list(x: np.ndarray, n: int) -> List[np.ndarray]:
    """List of ``n`` references to ``x`` (reference ``gauss_hermite.py:80-90``)."""
    return [x for _ in range(n)]


@check_shapes(
    "return[0]: [N]",
    "return[1]: [N]",
)
def gh_points_and_weights(n_gh: int) -> Tuple[np.ndarray, np.ndarray]:
    """Hermite-Gauss nodes/weights rescaled for N(0, 1) expectations
    (reference ``gauss_hermite.py:30-52``): returns z (pre-multiplied by
    sqrt(2)) and dz (divided by sqrt(pi)), so that
    E_{N(mu, s^2)}[f] ~= sum_i dz_i f(mu + s z_i).
    """
    z, dz = np.polynomial.hermite.hermgauss(n_gh)
    z = z * np.sqrt(2.0)
    dz = dz / np.sqrt(np.pi)
    return z, dz


@check_shapes(
    "return[0]: [N_quad, D]",
    "return[1]: [N_quad, 1]",
)
def ndgh_points_and_weights(dim: int, n_gh: int) -> Tuple[np.ndarray, np.ndarray]:
    """Cartesian-product grid over ``dim`` dimensions
    (reference ``gauss_hermite.py:75-109``): Z [n_gh**dim, dim],
    dZ [n_gh**dim, 1] (product of 1-D weights). Built from the exported
    grid helpers so Z shares their 'xy'-meshgrid point ordering (a private
    itertools grid used to order points differently from
    ``list_to_flat_grid``, silently permuting user-side comparisons)."""
    z, dz = gh_points_and_weights(n_gh)
    return reshape_Z_dZ(repeat_as_list(z, dim), repeat_as_list(dz, dim))


class NDiagGHQuadrature(GaussianQuadrature):
    """Gauss-Hermite quadrature for dim-D diagonal Gaussians
    (reference ``gauss_hermite.py:112-154``)."""

    def __init__(self, dim: int, n_gh: int) -> None:
        self.dim = dim
        self.n_gh = n_gh
        self.n_gh_total = n_gh ** dim
        Z, dZ = ndgh_points_and_weights(dim, n_gh)
        self.Z = np.asarray(Z)
        self.dZ = np.asarray(dZ)

    @inherit_check_shapes
    def _build_X_W(self, mean: jax.Array, var: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """mean/var: [b1, ..., bN, dim] ->
        X: [n_gh_total, b1, ..., bN, dim], W: [n_gh_total, 1, ..., 1]."""
        dtype = mean.dtype
        batch_ndim = mean.ndim - 1
        # Z: [n_gh_total, 1...1, dim]; W: [n_gh_total, 1...1, 1]
        shape_Z = (self.n_gh_total,) + (1,) * batch_ndim + (self.dim,)
        shape_W = (self.n_gh_total,) + (1,) * batch_ndim + (1,)
        Z = jnp.asarray(self.Z, dtype).reshape(shape_Z)
        W = jnp.asarray(self.dZ, dtype).reshape(shape_W)
        # Clamp to zero: reduced-precision matmul modes (see
        # GPFLOW_TPU_FAST_MATMUL in gpflow_tpu/__init__.py) can round the
        # predictive-variance cancellation slightly negative; sqrt of that
        # would poison the whole ELBO with NaN, whereas clamping degrades
        # gracefully to evaluating the integrand at the mean. Double-where:
        # sqrt(maximum(var, 0)) still has a NaN GRADIENT exactly when the
        # clamp engages (inf * 0 at var <= 0), so the clamped branch must
        # never see the raw var in the backward pass either.
        positive = var > 0
        safe_var = jnp.where(positive, var, jnp.ones((), var.dtype))
        stddev = jnp.where(positive, jnp.sqrt(safe_var), jnp.zeros((), var.dtype))
        X = mean[None] + stddev[None] * Z
        return X, W
