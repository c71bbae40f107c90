"""Prior distributions for Parameters.

The reference attaches ``tfp.distributions`` objects as parameter priors
(``/root/reference/gpflow/base.py:113-223``). We provide hashable frozen-dataclass
equivalents with ``log_prob``; hyperparameters are Python floats so priors live in
the static part of the ``Parameter`` pytree (no retrace churn).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import logdensities

__all__ = [
    "Beta",
    "Exponential",
    "Gamma",
    "HalfNormal",
    "Laplace",
    "LogNormal",
    "Normal",
    "Prior",
    "StudentT",
    "Uniform",
]


@dataclasses.dataclass(frozen=True)
class Prior:
    def __post_init__(self) -> None:
        # Enforce the static-pytree invariant at the boundary: priors ride
        # in jit-cached aux data, which must be HASHABLE. An array-valued
        # hyperparameter would otherwise surface as an opaque
        # "unhashable type: ArrayImpl" deep inside treedef hashing at the
        # first jit (round-2 review); float() here fails clearly instead.
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if not isinstance(v, float):
                try:
                    object.__setattr__(self, f.name, float(v))
                except (TypeError, ValueError) as e:
                    raise TypeError(
                        f"{type(self).__name__}.{f.name} must be a Python "
                        f"scalar (priors are static jit-cache metadata); got "
                        f"{type(v).__name__}"
                    ) from e

    def log_prob(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    @property
    def name(self) -> str:
        return type(self).__name__


@dataclasses.dataclass(frozen=True)
class Normal(Prior):
    loc: float = 0.0
    scale: float = 1.0

    def log_prob(self, x: jax.Array) -> jax.Array:
        return logdensities.gaussian(x, jnp.asarray(self.loc, x.dtype), jnp.asarray(self.scale, x.dtype) ** 2)


@dataclasses.dataclass(frozen=True)
class LogNormal(Prior):
    loc: float = 0.0
    scale: float = 1.0

    def log_prob(self, x: jax.Array) -> jax.Array:
        return logdensities.lognormal(x, jnp.asarray(self.loc, x.dtype), jnp.asarray(self.scale, x.dtype) ** 2)


@dataclasses.dataclass(frozen=True)
class Gamma(Prior):
    concentration: float = 1.0
    rate: float = 1.0  # log_prob uses scale = 1/rate

    def log_prob(self, x: jax.Array) -> jax.Array:
        shape = jnp.asarray(self.concentration, x.dtype)
        scale = 1.0 / jnp.asarray(self.rate, x.dtype)
        return logdensities.gamma(x, shape, scale)


@dataclasses.dataclass(frozen=True)
class Exponential(Prior):
    rate: float = 1.0

    def log_prob(self, x: jax.Array) -> jax.Array:
        return logdensities.exponential(x, 1.0 / jnp.asarray(self.rate, x.dtype))


@dataclasses.dataclass(frozen=True)
class Beta(Prior):
    concentration1: float = 1.0
    concentration0: float = 1.0

    def log_prob(self, x: jax.Array) -> jax.Array:
        return logdensities.beta(
            x, jnp.asarray(self.concentration1, x.dtype), jnp.asarray(self.concentration0, x.dtype)
        )


@dataclasses.dataclass(frozen=True)
class Laplace(Prior):
    loc: float = 0.0
    scale: float = 1.0

    def log_prob(self, x: jax.Array) -> jax.Array:
        return logdensities.laplace(x, jnp.asarray(self.loc, x.dtype), jnp.asarray(self.scale, x.dtype))


@dataclasses.dataclass(frozen=True)
class StudentT(Prior):
    df: float = 3.0
    loc: float = 0.0
    scale: float = 1.0

    def log_prob(self, x: jax.Array) -> jax.Array:
        return logdensities.student_t(
            x, jnp.asarray(self.loc, x.dtype), jnp.asarray(self.scale, x.dtype), self.df
        )


@dataclasses.dataclass(frozen=True)
class HalfNormal(Prior):
    scale: float = 1.0

    def log_prob(self, x: jax.Array) -> jax.Array:
        var = jnp.asarray(self.scale, x.dtype) ** 2
        density = jnp.log(2.0) + logdensities.gaussian(x, jnp.zeros((), x.dtype), var)
        return jnp.where(x >= 0, density, -jnp.inf)


@dataclasses.dataclass(frozen=True)
class Uniform(Prior):
    low: float = 0.0
    high: float = 1.0

    def log_prob(self, x: jax.Array) -> jax.Array:
        inside = (x >= self.low) & (x <= self.high)
        val = -jnp.log(jnp.asarray(self.high - self.low, x.dtype))
        return jnp.where(inside, val, -jnp.inf)
