"""Periodic kernel wrapper (reference ``/root/reference/gpflow/kernels/periodic.py:28-99``)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Parameter, TensorType
from ..bijectors import positive
from ..utilities.ops import difference_matrix
from .base import ActiveDims, Kernel
from ..utilities.shapes import check_shapes, inherit_check_shapes
from .stationaries import IsotropicStationary

__all__ = ["Periodic"]


class Periodic(Kernel):
    """Makes any IsotropicStationary base kernel periodic via the sin-warp
    u = (cos x, sin x) (MacKay 1998; reference ``periodic.py:28-99``):

        K(x, x') = base.K_r(sum_d |sin(pi d_d / period) / l_d|)   (if K_r)
        K(x, x') = base.K_r2(sum_d (sin(pi d_d / period) / l_d)^2) (otherwise)

    active_dims come from the base kernel.
    """

    @check_shapes(
        "period: [broadcast n_active_dims]",
    )
    def __init__(self, base_kernel: IsotropicStationary, period: TensorType = 1.0) -> None:
        if not isinstance(base_kernel, IsotropicStationary):
            raise TypeError("Periodic requires an IsotropicStationary kernel as the `base_kernel`")
        super().__init__()
        self.base_kernel = base_kernel
        self.period = Parameter(period, transform=positive(), name="period")
        self.base_kernel._validate_ard_active_dims(self.period)

    @property
    def active_dims(self) -> object:
        return self.base_kernel.active_dims

    @active_dims.setter
    def active_dims(self, value: ActiveDims) -> None:
        self.base_kernel.active_dims = value

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        return self.base_kernel.K_diag(X)

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        X = jnp.asarray(X)
        r = np.pi * difference_matrix(X, None if X2 is None else jnp.asarray(X2)) / self.period
        scaled_sine = jnp.sin(r) / self.base_kernel.lengthscales
        if hasattr(self.base_kernel, "K_r"):
            sine_r = jnp.sum(jnp.abs(scaled_sine), axis=-1)
            return self.base_kernel.K_r(sine_r)
        sine_r2 = jnp.sum(jnp.square(scaled_sine), axis=-1)
        return self.base_kernel.K_r2(sine_r2)
