"""ChangePoints kernel (reference ``/root/reference/gpflow/kernels/changepoints.py:26-171``)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..base import Parameter, TensorType
from ..bijectors import positive
from .base import Combination, Kernel
from ..utilities.shapes import check_shapes, inherit_check_shapes

__all__ = ["ChangePoints"]


class ChangePoints(Combination):
    """Fixed change-points along a 1-D input; regimes blended by logistic
    sigmoids sigma(x) = 1/(1+exp(-s(x - x0))):

        K1(x,x') (1-sig(x))(1-sig(x')) + K2(x,x') sig(x) sig(x')

    (Lloyd et al. 2014; reference ``changepoints.py:26-171``).
    """

    @check_shapes(
        "locations: [n_change_points]",
        "steepness: [broadcast n_change_points]",
    )
    def __init__(
        self,
        kernels: Sequence[Kernel],
        locations: TensorType,
        steepness: TensorType = 1.0,
        name: Optional[str] = None,
    ) -> None:
        if len(kernels) != len(locations) + 1:
            raise ValueError(
                f"Number of kernels ({len(kernels)}) must be one more than the number "
                f"of changepoint locations ({len(locations)})"
            )
        if isinstance(steepness, (list, tuple)) and len(steepness) != len(locations):
            raise ValueError(
                f"Dimension of steepness ({len(steepness)}) does not match number of "
                f"changepoint locations ({len(locations)})"
            )
        super().__init__(kernels, name=name)
        self.locations = Parameter(locations, name="locations")
        self.steepness = Parameter(steepness, transform=positive(), name="steepness")

    def _set_kernels(self, kernels: Sequence[Kernel]) -> None:
        # nested change-points are not flattened (reference ``changepoints.py:81-83``)
        self.kernels = list(kernels)

    @check_shapes(
        "X: [batch...]",
        "return: [batch..., Ncp]",
    )
    def _sigmoids(self, X: jax.Array) -> jax.Array:
        """X: [batch...] -> [batch..., Ncp]."""
        locations = jnp.sort(jnp.reshape(self.locations.value, (-1,)))
        steepness = jnp.reshape(self.steepness.value, (-1,))
        return jax.nn.sigmoid(steepness * (X[..., None] - locations))

    @staticmethod
    def _check_1d(X: jax.Array) -> None:
        # reference enforces [batch..., N, 1] via its check_shapes contract
        if X.shape[-1] != 1:
            raise ValueError(
                f"ChangePoints is defined for 1-dimensional inputs only; got "
                f"input dimension {X.shape[-1]}."
            )

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        X = jnp.asarray(X)
        self._check_1d(X)
        sig_X = self._sigmoids(X)  # [batch..., N, 1, Ncp]
        if X2 is None:
            batch = X.shape[:-2]
            N = X.shape[-2]
            Ncp = sig_X.shape[-1]
            sig_X1 = sig_X.reshape(batch + (N, 1, Ncp))
            sig_X2 = sig_X.reshape(batch + (1, N, Ncp))
            ones_shape = batch + (N, N, 1)
            X2_arg = None
        else:
            X2 = jnp.asarray(X2)
            self._check_1d(X2)
            batch = X.shape[:-2]
            batch2 = X2.shape[:-2]
            N = X.shape[-2]
            N2 = X2.shape[-2]
            Ncp = sig_X.shape[-1]
            sig_X2_raw = self._sigmoids(X2)
            sig_X1 = sig_X.reshape(batch + (N,) + (1,) * len(batch2) + (1, Ncp))
            sig_X2 = sig_X2_raw.reshape((1,) * len(batch) + (1,) + batch2 + (N2, Ncp))
            ones_shape = batch + (N,) + batch2 + (N2, 1)
            X2_arg = X2
        starters = sig_X1 * sig_X2
        stoppers = (1 - sig_X1) * (1 - sig_X2)
        ones = jnp.ones(ones_shape, dtype=X.dtype)
        starters = jnp.concatenate([ones, starters], axis=-1)
        stoppers = jnp.concatenate([stoppers, ones], axis=-1)
        kernel_stack = jnp.stack([k(X, X2_arg) for k in self.kernels], axis=-1)
        return jnp.sum(kernel_stack * starters * stoppers, axis=-1)

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        X = jnp.asarray(X)
        self._check_1d(X)
        batch = X.shape[:-2]
        N = X.shape[-2]
        sig_X = self._sigmoids(X).reshape(batch + (N, -1))  # [batch..., N, Ncp]
        ones = jnp.ones(batch + (N, 1), dtype=X.dtype)
        starters = jnp.concatenate([ones, sig_X * sig_X], axis=-1)
        stoppers = jnp.concatenate([(1 - sig_X) * (1 - sig_X), ones], axis=-1)
        kernel_stack = jnp.stack([k(X, full_cov=False) for k in self.kernels], axis=-1)
        return jnp.sum(kernel_stack * starters * stoppers, axis=-1)
