"""Discrete scalar likelihoods (reference
``/root/reference/gpflow/likelihoods/scalar_discrete.py``)."""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from .. import logdensities
from ..base import MeanAndVariance, Parameter, TensorType
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..bijectors import positive
from ..config import default_float, default_int
from .base import ScalarLikelihood
from .utils import inv_probit

__all__ = ["Bernoulli", "Ordinal", "Poisson"]


class Poisson(ScalarLikelihood):
    """p(y|f) = Poisson(y | invlink(f) * binsize)
    (reference ``scalar_discrete.py:29-78``)."""

    def __init__(
        self,
        invlink: Callable[[jax.Array], jax.Array] = jnp.exp,
        binsize: float = 1.0,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.invlink = invlink
        self.binsize = float(binsize)

    @inherit_check_shapes
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        return logdensities.poisson(Y, self.invlink(F) * self.binsize)

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        return self.invlink(F) * self.binsize

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return self.invlink(F) * self.binsize

    @inherit_check_shapes
    def _variational_expectations(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        if self.invlink is jnp.exp:
            return jnp.sum(
                Y * Fmu
                - jnp.exp(Fmu + Fvar / 2) * self.binsize
                - gammaln(Y + 1)
                + Y * np.log(self.binsize),
                axis=-1,
            )
        return super()._variational_expectations(X, Fmu, Fvar, Y)


class Bernoulli(ScalarLikelihood):
    """Binary classification, probit link by default
    (reference ``scalar_discrete.py:81-117``)."""

    def __init__(
        self, invlink: Callable[[jax.Array], jax.Array] = inv_probit, **kwargs: Any
    ) -> None:
        super().__init__(**kwargs)
        self.invlink = invlink

    @inherit_check_shapes
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        return logdensities.bernoulli(Y, self.invlink(F))

    @inherit_check_shapes
    def _predict_mean_and_var(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType
    ) -> MeanAndVariance:
        if self.invlink is inv_probit:
            p = inv_probit(Fmu / jnp.sqrt(1 + Fvar))
            return p, p - jnp.square(p)
        return super()._predict_mean_and_var(X, Fmu, Fvar)

    @inherit_check_shapes
    def _predict_log_density(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        p = self.predict_mean_and_var(X, Fmu, Fvar)[0]
        return jnp.sum(logdensities.bernoulli(Y, p), axis=-1)

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return self.invlink(F)

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        p = self.conditional_mean(X, F)
        return p - (p ** 2)


class Ordinal(ScalarLikelihood):
    """Ordinal regression via bin edges and probit (Chu & Ghahramani 2005;
    reference ``scalar_discrete.py:120-212``)."""

    @check_shapes(
        "bin_edges: [num_bins_minus_1]",
    )
    def __init__(self, bin_edges: np.ndarray, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.bin_edges = jnp.asarray(bin_edges, default_float())
        self.num_bins = int(np.asarray(bin_edges).size) + 1
        self.sigma = Parameter(1.0, transform=positive(), name="sigma")

    @inherit_check_shapes
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        Y = jnp.asarray(Y).astype(default_int())
        dtype = jnp.asarray(F).dtype
        inf = jnp.asarray([np.inf], dtype)
        scaled_bins_left = jnp.concatenate([self.bin_edges / self.sigma, inf], 0)
        scaled_bins_right = jnp.concatenate([-inf, self.bin_edges / self.sigma], 0)
        # JAX gathers WRAP negative bin labels and clamp over-range ones
        # inside jit (the reference's tf.gather raises): score with a
        # clipped label and NaN-poison invalid rows so mislabeled ordinal
        # data (1-based labels, -1 sentinels) fails loudly.
        valid = (Y >= 0) & (Y < self.num_bins)
        safe_Y = jnp.clip(Y, 0, self.num_bins - 1)
        selected_bins_left = jnp.take(scaled_bins_left, safe_Y)
        selected_bins_right = jnp.take(scaled_bins_right, safe_Y)
        logp = jnp.log(
            inv_probit(selected_bins_left - F / self.sigma)
            - inv_probit(selected_bins_right - F / self.sigma)
            + 1e-6
        )
        return jnp.where(valid, logp, jnp.asarray(jnp.nan, logp.dtype))

    @check_shapes(
        "F: [batch..., latent_dim]",
        "return: [batch_and_latent_dim, num_bins]",
    )
    def _make_phi(self, F: TensorType) -> jax.Array:
        """[flattened_batch, num_bins] bin-probability matrix
        (reference ``scalar_discrete.py:168-183``)."""
        F = jnp.asarray(F)
        dtype = F.dtype
        inf = jnp.asarray([np.inf], dtype)
        scaled_bins_left = jnp.concatenate([self.bin_edges / self.sigma, inf], 0)
        scaled_bins_right = jnp.concatenate([-inf, self.bin_edges / self.sigma], 0)
        return inv_probit(scaled_bins_left - F.reshape(-1, 1) / self.sigma) - inv_probit(
            scaled_bins_right - F.reshape(-1, 1) / self.sigma
        )

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        phi = self._make_phi(F)
        Ys = jnp.arange(self.num_bins, dtype=phi.dtype).reshape(-1, 1)
        return jnp.reshape(phi @ Ys, jnp.shape(F))

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        phi = self._make_phi(F)
        Ys = jnp.arange(self.num_bins, dtype=phi.dtype).reshape(-1, 1)
        E_y = phi @ Ys
        E_y2 = phi @ (Ys ** 2)
        return jnp.reshape(E_y2 - E_y ** 2, jnp.shape(F))
