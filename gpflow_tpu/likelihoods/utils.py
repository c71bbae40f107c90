"""Likelihood helpers (reference ``/root/reference/gpflow/likelihoods/utils.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utilities.shapes import check_shapes

__all__ = ["inv_probit"]


@check_shapes(
    "x: [batch...]",
    "return: [batch...]",
)
def inv_probit(x: jax.Array) -> jax.Array:
    """Gaussian CDF squashed to (jitter, 1-jitter) (reference ``utils.py:24-26``)."""
    jitter = 1e-3  # ensures output is strictly between 0 and 1
    return 0.5 * (1.0 + jax.scipy.special.erf(x / np.sqrt(2.0))) * (1 - 2 * jitter) + jitter
