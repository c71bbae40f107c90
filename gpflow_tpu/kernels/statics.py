"""Static kernels (reference ``/root/reference/gpflow/kernels/statics.py``)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..base import Parameter, TensorType
from ..bijectors import positive
from .base import ActiveDims, Kernel
from ..utilities.shapes import check_shapes, inherit_check_shapes

__all__ = ["Bias", "Constant", "Static", "White"]


class Static(Kernel):
    """Kernels independent of input values; only a variance parameter
    (reference ``statics.py:25-43``)."""

    @check_shapes(
        "variance: []",
    )
    def __init__(
        self, variance: TensorType = 1.0, active_dims: Optional[ActiveDims] = None
    ) -> None:
        super().__init__(active_dims)
        self.variance = Parameter(variance, transform=positive(), name="variance")

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        return jnp.full(jnp.shape(X)[:-1], jnp.squeeze(self.variance.value))


class White(Static):
    """k(x_n, x_m) = delta(n, m) sigma^2 (reference ``statics.py:46-65``)."""

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        X = jnp.asarray(X)
        if X2 is None:
            d = jnp.full(X.shape[:-1], jnp.squeeze(self.variance.value))
            # batched diag over the last axis
            return d[..., :, None] * jnp.eye(X.shape[-2], dtype=d.dtype)
        shape = X.shape[:-1] + jnp.shape(X2)[:-1]
        return jnp.zeros(shape, dtype=X.dtype)


class Constant(Static):
    """k(x, y) = sigma^2 (reference ``statics.py:68-91``)."""

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        X = jnp.asarray(X)
        if X2 is None:
            shape = X.shape[:-2] + (X.shape[-2], X.shape[-2])
        else:
            shape = X.shape[:-1] + jnp.shape(X2)[:-1]
        return jnp.full(shape, jnp.squeeze(self.variance.value))


#: Alias for Constant (reference ``statics.py:94``).
Bias = Constant
