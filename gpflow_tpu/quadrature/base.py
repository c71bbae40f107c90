"""Gaussian-expectation quadrature base (reference
``/root/reference/gpflow/quadrature/base.py:41-129``)."""
from __future__ import annotations

import abc
from collections.abc import Iterable
from typing import Any, Callable, List, Tuple, Union

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..utilities.shapes import check_shapes

__all__ = ["GaussianQuadrature"]


class GaussianQuadrature(abc.ABC):
    """Computes E_{q(x)}[f(x)] for diagonal Gaussians q via a weighted sum over
    quadrature points. Subclasses define the points/weights."""

    @abc.abstractmethod
    @check_shapes(
        "mean: [batch..., dim]",
        "var: [batch..., dim]",
        "return[0]: [N_quad, batch..., dim]",
        "return[1]: [N_quad, broadcast ones...]",
    )
    def _build_X_W(self, mean: jax.Array, var: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Returns X: [N_quad, ..., dim], W: [N_quad, broadcast-ones, 1]."""

    @check_shapes(
        "mean: [batch..., dim]",
        "var: [batch..., dim]",
    )
    def __call__(
        self,
        fun: Union[Callable[..., jax.Array], Iterable],
        mean: jax.Array,
        var: jax.Array,
        *args: Any,
        **kwargs: Any,
    ) -> Union[jax.Array, List[jax.Array]]:
        """sum_i W_i fun(X_i) (reference ``quadrature/base.py:41-96``).

        ``fun(X, ...)`` maps [N_quad, ..., dim] -> [N_quad, ...]; extra args
        (e.g. Y) broadcast against the leading quadrature axis.
        """
        X, W = self._build_X_W(mean, var)
        if isinstance(fun, Iterable) and not callable(fun):
            return [jnp.sum(f(X, *args, **kwargs) * W, axis=0) for f in fun]
        return jnp.sum(fun(X, *args, **kwargs) * W, axis=0)

    @check_shapes(
        "mean: [batch..., dim]",
        "var: [batch..., dim]",
    )
    def logspace(
        self,
        fun: Union[Callable[..., jax.Array], Iterable],
        mean: jax.Array,
        var: jax.Array,
        *args: Any,
        **kwargs: Any,
    ) -> Union[jax.Array, List[jax.Array]]:
        """log sum_i exp(fun(X_i) + log W_i) (reference ``base.py:98-129``)."""
        X, W = self._build_X_W(mean, var)
        logW = jnp.log(W)
        if isinstance(fun, Iterable) and not callable(fun):
            return [logsumexp(f(X, *args, **kwargs) + logW, axis=0) for f in fun]
        return logsumexp(fun(X, *args, **kwargs) + logW, axis=0)
