"""Closed-form log densities (reference ``/root/reference/gpflow/logdensities.py:29-156``).

Pure jnp functions; all broadcast elementwise except ``multivariate_normal``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, betaln

from .utilities.shapes import check_shapes

__all__ = [
    "bernoulli",
    "beta",
    "exponential",
    "gamma",
    "gaussian",
    "laplace",
    "lognormal",
    "multivariate_normal",
    "poisson",
    "student_t",
]


@check_shapes(
    "x: [broadcast shape...]",
    "mu: [broadcast shape...]",
    "var: [broadcast shape...]",
    "return: [shape...]",
)
def gaussian(x: jax.Array, mu: jax.Array, var: jax.Array) -> jax.Array:
    """log N(x | mu, var) (reference ``logdensities.py:29-35``)."""
    return -0.5 * (jnp.log(2.0 * jnp.pi) + jnp.log(var) + jnp.square(mu - x) / var)


@check_shapes(
    "x: [broadcast shape...]",
    "mu: [broadcast shape...]",
    "var: [broadcast shape...]",
    "return: [shape...]",
)
def lognormal(x: jax.Array, mu: jax.Array, var: jax.Array) -> jax.Array:
    lnx = jnp.log(x)
    return gaussian(lnx, mu, var) - lnx


@check_shapes(
    "x: [broadcast shape...]",
    "p: [broadcast shape...]",
    "return: [shape...]",
)
def bernoulli(x: jax.Array, p: jax.Array) -> jax.Array:
    return jnp.log(jnp.where(x > 0.5, p, 1.0 - p))


@check_shapes(
    "x: [broadcast shape...]",
    "lam: [broadcast shape...]",
    "return: [shape...]",
)
def poisson(x: jax.Array, lam: jax.Array) -> jax.Array:
    return x * jnp.log(lam) - lam - gammaln(x + 1.0)


@check_shapes(
    "x: [broadcast shape...]",
    "scale: [broadcast shape...]",
    "return: [shape...]",
)
def exponential(x: jax.Array, scale: jax.Array) -> jax.Array:
    return -x / scale - jnp.log(scale)


@check_shapes(
    "x: [broadcast shape...]",
    "shape: [broadcast shape...]",
    "scale: [broadcast shape...]",
    "return: [shape...]",
)
def gamma(x: jax.Array, shape: jax.Array, scale: jax.Array) -> jax.Array:
    return (
        -shape * jnp.log(scale)
        - gammaln(shape)
        + (shape - 1.0) * jnp.log(x)
        - x / scale
    )


@check_shapes(
    "x: [broadcast shape...]",
    "mean: [broadcast shape...]",
    "scale: [broadcast shape...]",
    "df: [broadcast shape...]",
    "return: [shape...]",
)
def student_t(x: jax.Array, mean: jax.Array, scale: jax.Array, df: jax.Array) -> jax.Array:
    """log Student-t density (reference ``logdensities.py:80-95``)."""
    df = jnp.asarray(df, dtype=x.dtype)
    const = (
        gammaln((df + 1.0) * 0.5)
        - gammaln(df * 0.5)
        - 0.5 * (jnp.log(jnp.square(scale)) + jnp.log(df) + jnp.log(jnp.pi))
    )
    return const - 0.5 * (df + 1.0) * jnp.log1p(
        (1.0 / df) * (jnp.square((x - mean) / scale))
    )


@check_shapes(
    "x: [broadcast shape...]",
    "alpha: [broadcast shape...]",
    "bet: [broadcast shape...]",
    "return: [shape...]",
)
def beta(x: jax.Array, alpha: jax.Array, bet: jax.Array) -> jax.Array:
    # clip x away from {0, 1} like the reference (logdensities.py:112-121):
    # proportion data containing exact 0.0/1.0 would otherwise give -inf
    # density and NaN gradients (log x reaches the alpha gradient directly)
    x = jnp.clip(x, 1e-6, 1.0 - 1e-6)
    return (alpha - 1.0) * jnp.log(x) + (bet - 1.0) * jnp.log1p(-x) - betaln(alpha, bet)


@check_shapes(
    "x: [broadcast shape...]",
    "mu: [broadcast shape...]",
    "sigma: [broadcast shape...]",
    "return: [shape...]",
)
def laplace(x: jax.Array, mu: jax.Array, sigma: jax.Array) -> jax.Array:
    return -jnp.abs(mu - x) / sigma - jnp.log(2.0 * sigma)


@check_shapes(
    "x: [D, broadcast R]",
    "mu: [D, broadcast R]",
    "L: [D, D]",
    "return: [R]",
)
def multivariate_normal(x: jax.Array, mu: jax.Array, L: jax.Array) -> jax.Array:
    """Log density of N(x | mu, LL^T) given a Cholesky factor ``L``.

    Matches reference ``logdensities.py:139-156``:
      x: [D, N] (N datapoints as columns), mu: [D, N] or [D, 1], L: [D, D].
    Returns [N] log densities.
    """
    d = x - mu
    alpha = jax.scipy.linalg.solve_triangular(L, d, lower=True)  # [D, N]
    num_dims = x.shape[0]
    p = -0.5 * jnp.sum(jnp.square(alpha), axis=0)
    p = p - 0.5 * num_dims * jnp.log(2.0 * jnp.pi)
    p = p - jnp.sum(jnp.log(jnp.diagonal(L)))
    return p
