"""Multi-latent likelihoods (reference
``/root/reference/gpflow/likelihoods/multilatent.py``).

The reference parametrizes the conditional observation distribution with a TFP
distribution; here the conditional-distribution callable returns any object
with ``log_prob(Y)``, ``mean()``, ``variance()`` — small in-house
distribution shims are provided (``NormalDistribution``, ``StudentTDistribution``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Type

import jax
import jax.numpy as jnp

from .. import logdensities
from ..base import TensorType
from ..bijectors import Bijector, positive
from ..utilities.shapes import check_shapes, inherit_check_shapes
from .base import QuadratureLikelihood

__all__ = [
    "HeteroskedasticTFPConditional",
    "MultiLatentLikelihood",
    "MultiLatentTFPConditional",
    "NormalDistribution",
    "StudentTDistribution",
]


@dataclasses.dataclass
class NormalDistribution:
    """Minimal Normal distribution with the TFP surface used here."""

    loc: jax.Array
    scale: jax.Array

    def log_prob(self, Y: TensorType) -> jax.Array:
        return logdensities.gaussian(jnp.asarray(Y), self.loc, jnp.square(self.scale))

    def mean(self) -> jax.Array:
        return self.loc

    def variance(self) -> jax.Array:
        return jnp.square(self.scale)


@dataclasses.dataclass
class StudentTDistribution:
    loc: jax.Array
    scale: jax.Array
    df: float = 3.0

    def log_prob(self, Y: TensorType) -> jax.Array:
        return logdensities.student_t(jnp.asarray(Y), self.loc, self.scale, self.df)

    def mean(self) -> jax.Array:
        return self.loc

    def variance(self) -> jax.Array:
        return jnp.square(self.scale) * (self.df / (self.df - 2.0))


class MultiLatentLikelihood(QuadratureLikelihood):
    """One-dimensional observation driven by multiple latent GPs
    (reference ``multilatent.py:26-41``)."""

    def __init__(self, latent_dim: int, **kwargs: Any) -> None:
        super().__init__(input_dim=None, latent_dim=latent_dim, observation_dim=1, **kwargs)


class MultiLatentTFPConditional(MultiLatentLikelihood):
    """Conditional observation distribution built from F by a callable
    (reference ``multilatent.py:44-93``)."""

    def __init__(
        self,
        latent_dim: int,
        conditional_distribution: Callable[..., Any],
        **kwargs: Any,
    ) -> None:
        super().__init__(latent_dim, **kwargs)
        self.conditional_distribution = conditional_distribution

    @inherit_check_shapes
    def _log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        return jnp.squeeze(self.conditional_distribution(F).log_prob(Y), -1)

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return self.conditional_distribution(F).mean()

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        return self.conditional_distribution(F).variance()


class HeteroskedasticTFPConditional(MultiLatentTFPConditional):
    """Two latent GPs parameterize loc and scale of the observation
    distribution (reference ``multilatent.py:96-133``)."""

    def __init__(
        self,
        distribution_class: Type[Any] = NormalDistribution,
        scale_transform: Optional[Any] = None,
        **kwargs: Any,
    ) -> None:
        if scale_transform is None:
            scale_transform = positive(base="exp")
        self.scale_transform = scale_transform

        @check_shapes(
            "F: [batch..., 2]",
        )
        def conditional_distribution(F: TensorType) -> Any:
            F = jnp.asarray(F)
            loc = F[..., :1]
            scale_fn = (
                self.scale_transform.forward
                if isinstance(self.scale_transform, Bijector)
                else self.scale_transform
            )
            scale = scale_fn(F[..., 1:])
            return distribution_class(loc, scale)

        super().__init__(
            latent_dim=2,
            conditional_distribution=conditional_distribution,
            **kwargs,
        )
