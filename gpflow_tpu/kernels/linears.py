"""Linear and Polynomial kernels (reference ``/root/reference/gpflow/kernels/linears.py``)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..base import Parameter, TensorType
from ..bijectors import positive
from .base import ActiveDims, Kernel
from ..utilities.shapes import check_shapes, inherit_check_shapes

__all__ = ["Linear", "Polynomial"]


class Linear(Kernel):
    """k(x, y) = sigma^2 x.y with optional ARD variance
    (reference ``linears.py:25-68``)."""

    @check_shapes(
        "variance: [broadcast n_active_dims]",
    )
    def __init__(
        self, variance: TensorType = 1.0, active_dims: Optional[ActiveDims] = None
    ) -> None:
        super().__init__(active_dims)
        self.variance = Parameter(variance, transform=positive(), name="variance")
        self._validate_ard_active_dims(self.variance)

    @property
    def ard(self) -> bool:
        return self.variance.ndim > 0

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        X = jnp.asarray(X)
        if X2 is None:
            return jnp.matmul(X * self.variance, jnp.swapaxes(X, -1, -2))
        X2 = jnp.asarray(X2)
        return jnp.tensordot(X * self.variance, X2, axes=[[-1], [-1]])

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        return jnp.sum(jnp.square(jnp.asarray(X)) * self.variance, axis=-1)


class Polynomial(Linear):
    """k(x, y) = (sigma^2 x.y + offset)^degree (reference ``linears.py:71-112``)."""

    @check_shapes(
        "variance: [broadcast n_active_dims]",
        "offset: []",
    )
    def __init__(
        self,
        degree: float = 3.0,
        variance: TensorType = 1.0,
        offset: TensorType = 1.0,
        active_dims: Optional[ActiveDims] = None,
    ) -> None:
        super().__init__(variance, active_dims)
        self.degree = float(degree)
        self.offset = Parameter(offset, transform=positive(), name="offset")

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        return (super().K(X, X2) + self.offset) ** self.degree

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        return (super().K_diag(X) + self.offset) ** self.degree
