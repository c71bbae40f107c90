"""Categorical latent-space kernel wrapper (reference
``/root/reference/gpflow/kernels/categorical.py``)."""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Parameter, TensorType
from ..config import default_float, default_int
from ..utilities.misc import set_trainable
from .base import Kernel
from ..utilities.shapes import inherit_check_shapes

__all__ = ["Categorical"]


def latent_from_labels(Z: jax.Array, labels: jax.Array) -> jax.Array:
    """Looks up latent values for integer labels
    (reference ``categorical.py:23-40``). Out-of-range labels are
    NaN-poisoned rather than silently wrapped/clamped by the JAX gather
    (tf.gather raises; same fail-loud policy as the likelihoods)."""
    indices = labels.astype(default_int())
    num = Z.shape[0]
    valid = (indices >= 0) & (indices < num)
    out = jnp.take(Z, jnp.clip(indices, 0, num - 1), axis=0)
    return jnp.where(valid[..., None], out, jnp.asarray(jnp.nan, out.dtype))


def _concat_inputs_with_latents(Z: jax.Array, X: jax.Array) -> jax.Array:
    """Replaces the final (label) column of X by latent values
    (reference ``categorical.py:43-57``)."""
    labels = X[..., -1]
    latent_values = latent_from_labels(Z, labels)
    return jnp.concatenate([X[..., :-1], latent_values], axis=-1)


class Categorical(Kernel):
    """Wraps a non-categorical kernel and a (fixed) categorical kernel,
    replacing integer labels with learned latent-space values
    (reference ``categorical.py:59-115``)."""

    def __init__(
        self,
        non_categorical_kernel: Kernel,
        categorical_kernel: Kernel,
        num_labels: int,
        *args: Any,
        **kwargs: Any,
    ) -> None:
        set_trainable(categorical_kernel, False)
        self.wrapped_kernel = non_categorical_kernel * categorical_kernel
        label_dim = 1
        # parametrized by the `num_labels - 1` differences of latent values
        self._Z_deltas = Parameter(
            np.random.random((num_labels - 1, label_dim))
            * np.asarray(categorical_kernel.lengthscales.value)
            * 10,
            name="Z_deltas",
        )
        super().__init__(*args, **kwargs)

    @property
    def Z(self) -> jax.Array:
        """Cumulative-sum parametrization: Z[0]=0, Z[k]=sum(deltas[:k])."""
        deltas = jnp.reshape(self._Z_deltas.value, (-1,))
        z = jnp.concatenate([jnp.zeros((1,), dtype=deltas.dtype), deltas])
        return jnp.cumsum(z)[:, None]

    def _concat_inputs_with_latents(self, X: TensorType) -> jax.Array:
        return _concat_inputs_with_latents(self.Z, jnp.asarray(X))

    @inherit_check_shapes
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        return self.wrapped_kernel.K(
            self._concat_inputs_with_latents(X),
            self._concat_inputs_with_latents(X2) if X2 is not None else None,
        )

    @inherit_check_shapes
    def K_diag(self, X: TensorType) -> jax.Array:
        return self.wrapped_kernel.K_diag(self._concat_inputs_with_latents(X))
