"""ArcCosine and Coregion kernels (reference ``/root/reference/gpflow/kernels/misc.py``)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Parameter, TensorType
from ..bijectors import positive
from ..config import default_float
from .base import ActiveDims, Kernel
from ..utilities.shapes import check_shapes, inherit_check_shapes

__all__ = ["ArcCosine", "Coregion"]


class ArcCosine(Kernel):
    """Arc-cosine ("neural network") kernel of orders {0, 1, 2}
    (Cho & Saul, NIPS 2009; reference ``misc.py:27-201``)."""

    implemented_orders = {0, 1, 2}

    @check_shapes(
        "variance: []",
        "weight_variances: [broadcast n_active_dims]",
        "bias_variance: []",
    )
    def __init__(
        self,
        order: int = 0,
        variance: TensorType = 1.0,
        weight_variances: TensorType = 1.0,
        bias_variance: TensorType = 1.0,
        *,
        active_dims: Optional[ActiveDims] = None,
        name: Optional[str] = None,
    ) -> None:
        super().__init__(active_dims=active_dims, name=name)
        if order not in self.implemented_orders:
            raise ValueError("Requested kernel order is not implemented.")
        self.order = order
        self.variance = Parameter(variance, transform=positive(), name="variance")
        self.bias_variance = Parameter(bias_variance, transform=positive(), name="bias_variance")
        self.weight_variances = Parameter(
            weight_variances, transform=positive(), name="weight_variances"
        )
        self._validate_ard_active_dims(self.weight_variances)

    @property
    def ard(self) -> bool:
        return self.weight_variances.ndim > 0

    @check_shapes(
        "X: [batch..., N, D]",
        "return: [batch..., N]",
    )
    def _diag_weighted_product(self, X: jax.Array) -> jax.Array:
        return jnp.sum(self.weight_variances * jnp.square(X), axis=-1) + self.bias_variance

    @check_shapes(
        "X: [batch..., N, D]",
        "X2: [batch2..., N2, D]",
        "return: [batch..., N, batch2..., N2] if X2 is not None",
        "return: [batch..., N, N] if X2 is None",
    )
    def _full_weighted_product(self, X: jax.Array, X2: Optional[jax.Array]) -> jax.Array:
        if X2 is None:
            return (
                jnp.matmul(self.weight_variances * X, jnp.swapaxes(X, -1, -2))
                + self.bias_variance
            )
        # [batch..., N, D] x [batch2..., N2, D] -> [batch..., N, batch2..., N2]
        return (
            jnp.tensordot(self.weight_variances * X, X2, axes=[[-1], [-1]])
            + self.bias_variance
        )

    @check_shapes(
        "theta: [any...]",
        "return: [any...]",
    )
    def _J(self, theta: jax.Array) -> jax.Array:
        """Order-dependent J functions, eqs. 4-7 of the NIPS2009 paper
        (reference ``misc.py:147-162``)."""
        if self.order == 0:
            return np.pi - theta
        elif self.order == 1:
            return jnp.sin(theta) + (np.pi - theta) * jnp.cos(theta)
        else:
            return 3.0 * jnp.sin(theta) * jnp.cos(theta) + (np.pi - theta) * (
                1.0 + 2.0 * jnp.cos(theta) ** 2
            )

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        X = jnp.asarray(X)
        X_denominator = jnp.sqrt(self._diag_weighted_product(X))  # [batch..., N]
        if X2 is None:
            X2_denominator = X_denominator[..., None, :]  # [batch..., 1, N]
            X_denom = X_denominator[..., :, None]  # [batch..., N, 1]
            numerator = self._full_weighted_product(X, None)
        else:
            X2 = jnp.asarray(X2)
            X2_denominator = jnp.sqrt(self._diag_weighted_product(X2))  # [batch2..., N2]
            # broadcast to [batch..., N, batch2..., N2]
            n_batch2 = X2.ndim - 1
            n_batch = X.ndim - 1
            X_denom = X_denominator.reshape(X_denominator.shape + (1,) * n_batch2)
            X2_denominator = X2_denominator.reshape((1,) * n_batch + X2_denominator.shape)
            numerator = self._full_weighted_product(X, X2)
        cos_theta = numerator / X_denom / X2_denominator
        # On TPU the f64 matmul/rsqrt rounding can push |cos| past 1 by more
        # than the reference's 1e-15 squash margin - clip first (the excess is
        # pure rounding; the squash below keeps the arccos gradient finite).
        cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
        jitter = 1e-15
        theta = jnp.arccos(jitter + (1 - 2 * jitter) * cos_theta)
        return (
            self.variance
            * (1.0 / np.pi)
            * self._J(theta)
            * X_denom ** self.order
            * X2_denominator ** self.order
        )

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        X_product = self._diag_weighted_product(jnp.asarray(X))
        const = (1.0 / np.pi) * self._J(jnp.zeros((), default_float()))
        return self.variance * const * X_product ** self.order


class Coregion(Kernel):
    """Coregionalization lookup kernel: K(x, y) = B[x, y] with
    B = W W^T + diag(kappa) (reference ``misc.py:203-300``). Inputs are
    integer indices stored as floats in a single column.
    """

    def __init__(
        self,
        output_dim: int,
        rank: int,
        *,
        active_dims: Optional[ActiveDims] = None,
        name: Optional[str] = None,
    ) -> None:
        super().__init__(active_dims=active_dims, name=name)
        self.output_dim = output_dim
        self.rank = rank
        W = 0.1 * np.ones((self.output_dim, self.rank))
        kappa = np.ones(self.output_dim)
        self.W = Parameter(W, name="W")
        self.kappa = Parameter(kappa, transform=positive(), name="kappa")

    @check_shapes("return: [P, P]")
    def output_covariance(self) -> jax.Array:
        return jnp.matmul(self.W.value, self.W.value.T) + jnp.diag(self.kappa.value)

    @check_shapes("return: [P]")
    def output_variance(self) -> jax.Array:
        return jnp.sum(jnp.square(self.W.value), axis=1) + self.kappa

    def _indices(self, X: TensorType) -> Tuple[jax.Array, jax.Array]:
        """(clipped int indices, per-row validity). JAX gathers wrap/clamp
        out-of-range labels (tf.gather raises); invalid outputs are
        NaN-poisoned instead so off-by-one label columns fail loudly —
        same policy as the likelihoods (round-2 review)."""
        Xi = jnp.asarray(X)[..., 0].astype(jnp.int32)
        valid = (Xi >= 0) & (Xi < self.output_dim)
        return jnp.clip(Xi, 0, self.output_dim - 1), valid

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        B = self.output_covariance()  # [O, O]
        Xi, v1 = self._indices(X)  # [batch..., N]
        if X2 is None:
            # result[..., n, m] = B[X[n], X[m]]
            out = B[Xi[..., :, None], Xi[..., None, :]]
            valid = v1[..., :, None] & v1[..., None, :]
            return jnp.where(valid, out, jnp.asarray(jnp.nan, out.dtype))
        X2i, v2 = self._indices(X2)  # [batch2..., N2]
        # [batch..., N, batch2..., N2]
        idx1 = Xi.reshape(Xi.shape + (1,) * X2i.ndim)
        idx2 = X2i.reshape((1,) * Xi.ndim + X2i.shape)
        out = B[idx1, idx2]
        valid = v1.reshape(idx1.shape) & v2.reshape(idx2.shape)
        return jnp.where(valid, out, jnp.asarray(jnp.nan, out.dtype))

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        Xi, valid = self._indices(X)
        out = jnp.take(self.output_variance(), Xi, axis=0)
        return jnp.where(valid, out, jnp.asarray(jnp.nan, out.dtype))
