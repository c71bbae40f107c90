"""Continuous scalar likelihoods (reference
``/root/reference/gpflow/likelihoods/scalar_continuous.py``)."""
from __future__ import annotations

from math import sqrt
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from .. import logdensities
from ..base import MeanAndVariance, TensorType
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..config import default_likelihood_positive_minimum
from ..utilities.parameter_or_function import (
    ConstantOrFunction,
    evaluate_parameter_or_function,
    prepare_parameter_or_function,
)
from .base import ScalarLikelihood
from .utils import inv_probit

__all__ = ["Beta", "Exponential", "Gamma", "Gaussian", "StudentT"]


def _lower_bound(value: Optional[float] = None) -> float:
    if value is None:
        return default_likelihood_positive_minimum()
    return value


class Gaussian(ScalarLikelihood):
    """Gaussian noise; variance (or scale) may be a constant Parameter or an
    input-dependent Function (reference ``scalar_continuous.py:41-148``).
    The 1e-6 lower bound on variance matches the reference default."""

    def __init__(
        self,
        variance: Optional[ConstantOrFunction] = None,
        *,
        scale: Optional[ConstantOrFunction] = None,
        variance_lower_bound: Optional[float] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.variance_lower_bound = _lower_bound(variance_lower_bound)
        self.scale_lower_bound = sqrt(self.variance_lower_bound)
        if scale is None:
            if variance is None:
                variance = 1.0
            self.variance = prepare_parameter_or_function(
                variance, lower_bound=self.variance_lower_bound
            )
            self.scale = None
        else:
            if variance is not None:
                raise ValueError("Cannot set both `variance` and `scale`.")
            self.variance = None
            self.scale = prepare_parameter_or_function(scale, lower_bound=self.scale_lower_bound)

    @check_shapes(
        "X: [batch..., N, D]",
        "return: [broadcast batch..., broadcast N, broadcast P]",
    )
    def _variance(self, X: TensorType) -> jax.Array:
        if self.variance is not None:
            return evaluate_parameter_or_function(
                self.variance, X, lower_bound=self.variance_lower_bound
            )
        return (
            evaluate_parameter_or_function(self.scale, X, lower_bound=self.scale_lower_bound)
            ** 2
        )

    @check_shapes(
        "X: [batch..., N, D]",
        "return: [batch..., N, 1]",
    )
    def variance_at(self, X: TensorType) -> jax.Array:
        """Noise variance broadcast to [N, 1] (reference ``scalar_continuous.py:104-111``)."""
        X = jnp.asarray(X)
        variance = self._variance(X)
        return jnp.broadcast_to(variance, X.shape[:-1] + (1,))

    @inherit_check_shapes
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        return logdensities.gaussian(Y, F, self._variance(X))

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return jnp.asarray(F)

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        return jnp.broadcast_to(self._variance(X), jnp.shape(F))

    @inherit_check_shapes
    def _predict_mean_and_var(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType
    ) -> MeanAndVariance:
        return jnp.asarray(Fmu), Fvar + self._variance(X)

    @inherit_check_shapes
    def _predict_log_density(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        return jnp.sum(logdensities.gaussian(Y, Fmu, Fvar + self._variance(X)), axis=-1)

    @inherit_check_shapes
    def _variational_expectations(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        """Closed form (reference ``scalar_continuous.py:138-148``)."""
        variance = self._variance(X)
        return jnp.sum(
            -0.5 * np.log(2 * np.pi)
            - 0.5 * jnp.log(variance)
            - 0.5 * ((Y - Fmu) ** 2 + Fvar) / variance,
            axis=-1,
        )


class Exponential(ScalarLikelihood):
    """p(y|f) = Exp(y | invlink(f)) (reference ``scalar_continuous.py:151-174``)."""

    def __init__(self, invlink: Callable[[jax.Array], jax.Array] = jnp.exp, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.invlink = invlink

    @inherit_check_shapes
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        return logdensities.exponential(Y, self.invlink(F))

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return self.invlink(F)

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        return jnp.square(self.invlink(F))

    @inherit_check_shapes
    def _variational_expectations(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        if self.invlink is jnp.exp:
            return jnp.sum(-jnp.exp(-Fmu + Fvar / 2) * Y - Fmu, axis=-1)
        return super()._variational_expectations(X, Fmu, Fvar, Y)


class StudentT(ScalarLikelihood):
    """Student-t noise (reference ``scalar_continuous.py:177-213``)."""

    def __init__(
        self,
        scale: ConstantOrFunction = 1.0,
        df: float = 3.0,
        scale_lower_bound: Optional[float] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.df = df
        self.scale_lower_bound = _lower_bound(scale_lower_bound)
        self.scale = prepare_parameter_or_function(scale, lower_bound=self.scale_lower_bound)

    @check_shapes(
        "X: [batch..., N, D]",
        "return: [broadcast batch..., broadcast N, broadcast P]",
    )
    def _scale(self, X: TensorType) -> jax.Array:
        return evaluate_parameter_or_function(self.scale, X, lower_bound=self.scale_lower_bound)

    @inherit_check_shapes
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        return logdensities.student_t(Y, F, self._scale(X), self.df)

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return jnp.asarray(F)

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        var = (self._scale(X) ** 2) * (self.df / (self.df - 2.0))
        return jnp.broadcast_to(var, jnp.shape(F))


class Gamma(ScalarLikelihood):
    """Transformed GP gives the Gamma *scale*
    (reference ``scalar_continuous.py:216-267``)."""

    def __init__(
        self,
        invlink: Callable[[jax.Array], jax.Array] = jnp.exp,
        shape: ConstantOrFunction = 1.0,
        shape_lower_bound: Optional[float] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.invlink = invlink
        self.shape_lower_bound = _lower_bound(shape_lower_bound)
        self.shape = prepare_parameter_or_function(shape, lower_bound=self.shape_lower_bound)

    @check_shapes(
        "X: [batch..., N, D]",
        "return: [broadcast batch..., broadcast N, broadcast P]",
    )
    def _shape(self, X: TensorType) -> jax.Array:
        return evaluate_parameter_or_function(self.shape, X, lower_bound=self.shape_lower_bound)

    @inherit_check_shapes
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        return logdensities.gamma(Y, self._shape(X), self.invlink(F))

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return self._shape(X) * self.invlink(F)

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        scale = self.invlink(F)
        return self._shape(X) * (scale ** 2)

    @inherit_check_shapes
    def _variational_expectations(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        if self.invlink is jnp.exp:
            shape = self._shape(X)
            return jnp.sum(
                -shape * Fmu
                - gammaln(shape)
                + (shape - 1.0) * jnp.log(Y)
                - Y * jnp.exp(-Fmu + Fvar / 2.0),
                axis=-1,
            )
        return super()._variational_expectations(X, Fmu, Fvar, Y)


class Beta(ScalarLikelihood):
    """Reparametrized Beta: mean = invlink(f), alpha = scale*mean,
    beta = scale*(1-mean) (reference ``scalar_continuous.py:270-330``)."""

    def __init__(
        self,
        invlink: Callable[[jax.Array], jax.Array] = inv_probit,
        scale: ConstantOrFunction = 1.0,
        scale_lower_bound: Optional[float] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.scale_lower_bound = _lower_bound(scale_lower_bound)
        self.scale = prepare_parameter_or_function(scale, lower_bound=self.scale_lower_bound)
        self.invlink = invlink

    @check_shapes(
        "X: [batch..., N, D]",
        "return: [broadcast batch..., broadcast N, broadcast P]",
    )
    def _scale(self, X: TensorType) -> jax.Array:
        return evaluate_parameter_or_function(self.scale, X, lower_bound=self.scale_lower_bound)

    @inherit_check_shapes
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        mean = self.invlink(F)
        scale = self._scale(X)
        alpha = mean * scale
        beta = scale - alpha
        return logdensities.beta(Y, alpha, beta)

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return self.invlink(F)

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        mean = self.invlink(F)
        var = (mean - jnp.square(mean)) / (self._scale(X) + 1.0)
        return jnp.broadcast_to(var, jnp.shape(F))
