"""Stationary kernels (reference ``/root/reference/gpflow/kernels/stationaries.py``).

The isotropic hot path computes scaled squared distances via one MXU matmul
(``utilities/ops.py square_distance``); an optional fused Pallas kernel covers
RBF/Matern K-matrix construction on TPU (``gpflow_tpu.ops``).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Parameter, TensorType
from ..bijectors import positive
from ..utilities.ops import difference_matrix, square_distance
from ..utilities.shapes import check_shapes, inherit_check_shapes
from .base import ActiveDims, Kernel

__all__ = [
    "AnisotropicStationary",
    "Cosine",
    "Exponential",
    "IsotropicStationary",
    "Matern12",
    "Matern32",
    "Matern52",
    "RationalQuadratic",
    "SquaredExponential",
    "Stationary",
]


class Stationary(Kernel):
    """Base for kernels depending only on d = x - x'; handles ARD lengthscales
    (reference ``stationaries.py:27-83``)."""

    @check_shapes(
        "variance: []",
        "lengthscales: [broadcast n_active_dims]",
    )
    def __init__(
        self, variance: TensorType = 1.0, lengthscales: TensorType = 1.0, **kwargs: Any
    ) -> None:
        for kwarg in kwargs:
            if kwarg not in {"name", "active_dims"}:
                raise TypeError(f"Unknown keyword argument: {kwarg}")
        super().__init__(**kwargs)
        self.variance = Parameter(variance, transform=positive(), name="variance")
        self.lengthscales = Parameter(lengthscales, transform=positive(), name="lengthscales")
        self._validate_ard_active_dims(self.lengthscales)

    @property
    def ard(self) -> bool:
        return self.lengthscales.ndim > 0

    @check_shapes(
        "X: [batch..., N, D]",
        "return: [batch..., N, D]",
    )
    def scale(self, X: Optional[TensorType]) -> Optional[jax.Array]:
        return X / self.lengthscales if X is not None else X

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        return jnp.full(jnp.shape(X)[:-1], jnp.squeeze(self.variance.value))


class IsotropicStationary(Stationary):
    """Kernels of r = ||x - x'|| (reference ``stationaries.py:86-130``).

    Subclasses implement ``K_r2`` (elementwise on squared scaled distance) or
    ``K_r`` (on the distance; sqrt clipped at 1e-36 exactly like the reference
    ``stationaries.py:114`` for gradient stability at r=0).
    """

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        family = _PALLAS_EXACT_TYPES.get(type(self))  # exact type: a subclass
        # overriding K_r/K_r2 must never be silently routed past its override
        if family is not None:
            from ..ops.pallas_distance import pallas_available, stationary_kernel_matrix

            Xa = jnp.asarray(X)
            X2a = None if X2 is None else jnp.asarray(X2)
            if pallas_available(Xa.dtype) and Xa.ndim == 2 and (X2a is None or X2a.ndim == 2):
                Z = Xa if X2a is None else X2a
                alpha = jnp.squeeze(self.alpha.value) if family == "rq" else None
                return stationary_kernel_matrix(
                    Xa, Z, self.lengthscales.value, jnp.squeeze(self.variance.value),
                    family, alpha=alpha,
                )
        r2 = self.scaled_squared_euclid_dist(X, X2)
        return self.K_r2(r2)

    @check_shapes(
        "r2: [batch...]",
        "return: [batch...]",
    )
    def K_r2(self, r2: jax.Array) -> jax.Array:
        if hasattr(self, "K_r"):
            r = jnp.sqrt(jnp.maximum(r2, 1e-36))
            return self.K_r(r)
        raise NotImplementedError

    @check_shapes(
        "X: [batch..., N, D]",
        "X2: [batch2..., N2, D]",
        "return: [batch..., N, batch2..., N2] if X2 is not None",
        "return: [batch..., N, N] if X2 is None",
    )
    def scaled_squared_euclid_dist(
        self, X: TensorType, X2: Optional[TensorType] = None
    ) -> jax.Array:
        return square_distance(self.scale(jnp.asarray(X)), self.scale(None if X2 is None else jnp.asarray(X2)))


class AnisotropicStationary(Stationary):
    """Kernels of d = (x - x')/l (reference ``stationaries.py:133-192``).

    Subclasses implement ``K_d(d)`` on the scaled pairwise difference matrix.
    Anisotropic kernels may possess negative lengthscales, so ARD lengthscales
    are left unconstrained (reference ``stationaries.py:166-168``).
    """

    @check_shapes(
        "variance: []",
        "lengthscales: [broadcast n_active_dims]",
    )
    def __init__(
        self, variance: TensorType = 1.0, lengthscales: TensorType = 1.0, **kwargs: Any
    ) -> None:
        super().__init__(variance, lengthscales, **kwargs)
        if self.ard:
            self.lengthscales = Parameter(self.lengthscales.numpy(), name="lengthscales")

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        return self.K_d(self.scaled_difference_matrix(X, X2))

    @check_shapes(
        "X: [batch..., N, D]",
        "X2: [batch2..., N2, D]",
        "return: [batch..., N, batch2..., N2, D] if X2 is not None",
        "return: [batch..., N, N, D] if X2 is None",
    )
    def scaled_difference_matrix(
        self, X: TensorType, X2: Optional[TensorType] = None
    ) -> jax.Array:
        return difference_matrix(self.scale(jnp.asarray(X)), self.scale(None if X2 is None else jnp.asarray(X2)))

    @check_shapes(
        "d: [batch..., N, D]",
        "return: [batch..., N]",
    )
    def K_d(self, d: jax.Array) -> jax.Array:
        raise NotImplementedError


class SquaredExponential(IsotropicStationary):
    """RBF: k(r) = sigma^2 exp(-r^2/2) (reference ``stationaries.py:195-210``).

    On TPU with f32/bf16 the full K matrix is computed by a fused Pallas tile
    kernel (``gpflow_tpu.ops.stationary_kernel_matrix``, routed via
    ``_PALLAS_EXACT_TYPES``): cross terms on the MXU, norm corrections + exp
    fused in VMEM, gradients as matmuls via custom VJP.
    """

    @inherit_check_shapes
    def K_r2(self, r2: jax.Array) -> jax.Array:
        return self.variance * jnp.exp(-0.5 * r2)


class RationalQuadratic(IsotropicStationary):
    """k(r) = sigma^2 (1 + r^2/(2 alpha))^(-alpha) (reference ``stationaries.py:213-238``)."""

    def __init__(
        self,
        variance: TensorType = 1.0,
        lengthscales: TensorType = 1.0,
        alpha: TensorType = 1.0,
        active_dims: Optional[ActiveDims] = None,
    ) -> None:
        super().__init__(variance=variance, lengthscales=lengthscales, active_dims=active_dims)
        self.alpha = Parameter(alpha, transform=positive(), name="alpha")

    @inherit_check_shapes
    def K_r2(self, r2: jax.Array) -> jax.Array:
        return self.variance * (1 + 0.5 * r2 / self.alpha) ** (-self.alpha.value)


class Exponential(IsotropicStationary):
    """k(r) = sigma^2 exp(-r/2) (reference ``stationaries.py:241-253``)."""

    @check_shapes(
        "r: [batch...]",
        "return: [batch...]",
    )
    def K_r(self, r: jax.Array) -> jax.Array:
        return self.variance * jnp.exp(-0.5 * r)


class Matern12(IsotropicStationary):
    """k(r) = sigma^2 exp(-r) (reference ``stationaries.py:256-271``)."""

    @check_shapes(
        "r: [batch...]",
        "return: [batch...]",
    )
    def K_r(self, r: jax.Array) -> jax.Array:
        return self.variance * jnp.exp(-r)


class Matern32(IsotropicStationary):
    """k(r) = sigma^2 (1 + sqrt3 r) exp(-sqrt3 r) (reference ``stationaries.py:274-292``)."""

    @check_shapes(
        "r: [batch...]",
        "return: [batch...]",
    )
    def K_r(self, r: jax.Array) -> jax.Array:
        sqrt3 = np.sqrt(3.0)
        return self.variance * (1.0 + sqrt3 * r) * jnp.exp(-sqrt3 * r)


class Matern52(IsotropicStationary):
    """k(r) = sigma^2 (1 + sqrt5 r + 5/3 r^2) exp(-sqrt5 r)
    (reference ``stationaries.py:295-313``)."""

    @check_shapes(
        "r: [batch...]",
        "return: [batch...]",
    )
    def K_r(self, r: jax.Array) -> jax.Array:
        sqrt5 = np.sqrt(5.0)
        return self.variance * (1.0 + sqrt5 * r + 5.0 / 3.0 * jnp.square(r)) * jnp.exp(-sqrt5 * r)


class Cosine(AnisotropicStationary):
    """k(d) = sigma^2 cos(2 pi sum_i d_i) (reference ``stationaries.py:316-332``)."""

    @inherit_check_shapes
    def K_d(self, d: jax.Array) -> jax.Array:
        d = jnp.sum(d, axis=-1)
        return self.variance * jnp.cos(2 * np.pi * d)


# Isotropic kernels whose K matrix routes to the fused Pallas tile kernel on
# TPU (f32/bf16, 2-D inputs). Keyed by EXACT type so user subclasses that
# override K_r/K_r2 keep their own math.
_PALLAS_EXACT_TYPES = {
    SquaredExponential: "rbf",
    RationalQuadratic: "rq",
    Exponential: "exponential",
    Matern12: "matern12",
    Matern32: "matern32",
    Matern52: "matern52",
}
