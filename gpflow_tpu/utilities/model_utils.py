"""Model helper utilities (reference ``/root/reference/gpflow/utilities/model_utils.py``)."""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .shapes import check_shapes

__all__ = ["add_likelihood_noise_cov", "add_noise_cov", "assert_params_false"]


def assert_params_false(called_method: Callable[..., Any], **kwargs: bool) -> None:
    """Raises NotImplementedError if any kwarg is True
    (reference ``model_utils.py:10-25``)."""
    errors_str = ", ".join(f"{param}={value}" for param, value in kwargs.items() if value)
    if errors_str:
        raise NotImplementedError(
            f"{called_method.__qualname__} does not currently support: {errors_str}"
        )


@check_shapes(
    "K: [batch..., N, N]",
    "likelihood_variance: [broadcast batch..., broadcast N]",
    "return: [batch..., N, N]",
)
def add_noise_cov(K: jax.Array, likelihood_variance: jax.Array) -> jax.Array:
    """K + sigma^2 I, batched over leading dims (reference ``model_utils.py:28-38``)."""
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    return K + jnp.asarray(likelihood_variance) * eye


@check_shapes(
    "K: [batch..., N, N]",
    "X: [batch..., N, D]",
    "return: [batch..., N, N]",
)
def add_likelihood_noise_cov(K: jax.Array, likelihood: Any, X: jax.Array) -> jax.Array:
    """K + diag(likelihood.variance_at(X)), batched over leading dims like
    the reference's set_diag form (``model_utils.py:41-50``): K
    [batch..., N, N], X [batch..., N, D] -> variance [batch..., N] scales
    the eye per batch element (a flat reshape broke batched inputs,
    round-2 review)."""
    variance = likelihood.variance_at(X)  # [batch..., N, 1]
    variance = jnp.squeeze(jnp.asarray(variance), axis=-1)  # [batch..., N]
    n = K.shape[-1]
    return K + variance[..., None] * jnp.eye(n, dtype=K.dtype)
