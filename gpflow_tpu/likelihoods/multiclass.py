"""Multiclass likelihoods (reference
``/root/reference/gpflow/likelihoods/multiclass.py``)."""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import MeanAndVariance, Module, Parameter, TensorType
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..bijectors import Sigmoid
from ..config import default_float, default_int
from ..priors import Beta as BetaPrior
from .base import Likelihood, MonteCarloLikelihood

__all__ = ["MultiClass", "RobustMax", "Softmax"]


class Softmax(MonteCarloLikelihood):
    """Soft-max multiclass likelihood; Monte-Carlo variational expectations
    (reference ``multiclass.py:29-52``)."""

    def __init__(self, num_classes: int, **kwargs: Any) -> None:
        super().__init__(input_dim=None, latent_dim=num_classes, observation_dim=None, **kwargs)
        self.num_classes = self.latent_dim

    @inherit_check_shapes
    def _log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        F = jnp.asarray(F)
        labels = jnp.asarray(Y)[..., 0].astype(default_int())
        log_p = jax.nn.log_softmax(F, axis=-1)
        # JAX gathers WRAP negative indices and clamp over-range ones inside
        # jit, so an invalid label (e.g. a -1 sentinel, or 1-based classes)
        # would silently score some other class. The reference's
        # sparse_softmax_cross_entropy raises; the jit-compatible loud
        # equivalent is NaN for invalid rows.
        valid = (labels >= 0) & (labels < self.num_classes)
        safe = jnp.clip(labels, 0, self.num_classes - 1)
        picked = jnp.take_along_axis(log_p, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, picked, jnp.asarray(jnp.nan, picked.dtype))

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return jax.nn.softmax(jnp.asarray(F), axis=-1)

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        p = self.conditional_mean(X, F)
        return p - p ** 2


class RobustMax(Module):
    """Multi-class robust-max inverse link: 1-eps for the argmax latent,
    eps/(k-1) otherwise (reference ``multiclass.py:55-158``)."""

    @check_shapes(
        "epsilon: []",
    )
    def __init__(self, num_classes: int, epsilon: float = 1e-3, **kwargs: Any) -> None:
        transform = Sigmoid()
        prior = BetaPrior(0.2, 5.0)
        self.epsilon = Parameter(
            epsilon, transform=transform, prior=prior, trainable=False, name="epsilon"
        )
        self.num_classes = num_classes
        self._squash = 1e-6

    @check_shapes(
        "F: [broadcast batch..., latent_dim]",
        "return: [batch..., latent_dim]",
    )
    def __call__(self, F: TensorType) -> jax.Array:
        F = jnp.asarray(F)
        # argmax over the LATENT axis (last), not axis=1: the contract
        # admits leading batch dims (quadrature/sample-expanded F), where
        # axis=1 would silently reduce a batch dim instead. Identical to
        # the reference's tf.argmax(F, 1) for the [N, latent_dim] case
        # (reference multiclass.py:64).
        i = jnp.argmax(F, axis=-1)
        one_hot = jax.nn.one_hot(i, self.num_classes, dtype=F.dtype)
        eps = self.epsilon.value
        return one_hot * (1.0 - eps) + (1.0 - one_hot) * self.eps_k1

    @property
    @check_shapes(
        "return: []",
    )
    def eps_k1(self) -> jax.Array:
        return self.epsilon / (self.num_classes - 1.0)

    @check_shapes(
        "val: [batch...]",
        "return: [batch...]",
    )
    def safe_sqrt(self, val: jax.Array) -> jax.Array:
        return jnp.sqrt(jnp.maximum(val, 1e-10))

    @check_shapes(
        "Y: [broadcast batch..., observation_dim]",
        "mu: [broadcast batch..., latent_dim]",
        "var: [broadcast batch..., latent_dim]",
        "gh_x: [n_quad_points]",
        "gh_w: [n_quad_points]",
        "return: [batch..., observation_dim]",
    )
    def prob_is_largest(
        self,
        Y: TensorType,
        mu: jax.Array,
        var: jax.Array,
        gh_x: np.ndarray,
        gh_w: np.ndarray,
    ) -> jax.Array:
        """P(f_y = max_i f_i) under independent Gaussians, via the GH trick
        (reference ``multiclass.py:116-158``)."""
        Yi = jnp.asarray(Y).reshape(-1).astype(default_int())
        mu = jnp.asarray(mu)
        var = jnp.asarray(var)
        gh_x = jnp.asarray(gh_x, mu.dtype)
        gh_w = jnp.asarray(gh_w, mu.dtype)

        oh_on = jax.nn.one_hot(Yi, self.num_classes, dtype=mu.dtype)  # [N, K]
        mu_selected = jnp.sum(oh_on * mu, axis=1)  # [N]
        var_selected = jnp.sum(oh_on * var, axis=1)

        # GH grid on the selected latent: [N, Ngh]
        X = mu_selected[:, None] + gh_x * self.safe_sqrt(2.0 * var_selected)[:, None]

        # CDF of each latent at each grid point: [N, K, Ngh]
        dist = (X[:, None, :] - mu[:, :, None]) / self.safe_sqrt(var)[:, :, None]
        cdfs = 0.5 * (1.0 + jax.scipy.special.erf(dist / np.sqrt(2.0)))
        cdfs = cdfs * (1 - 2 * self._squash) + self._squash

        # blank out the selected latent's own cdf
        oh_off = 1.0 - oh_on
        cdfs = cdfs * oh_off[:, :, None] + oh_on[:, :, None]

        # product over latents, GH-weighted sum over grid: [N, 1]
        return jnp.prod(cdfs, axis=1) @ (gh_w / np.sqrt(np.pi)).reshape(-1, 1)


class MultiClass(Likelihood):
    """Multiclass classification with the RobustMax inverse link; closed-form
    variational expectations via ``prob_is_largest``
    (reference ``multiclass.py:161-243``)."""

    def __init__(
        self, num_classes: int, invlink: Optional[RobustMax] = None, **kwargs: Any
    ) -> None:
        super().__init__(input_dim=None, latent_dim=num_classes, observation_dim=None, **kwargs)
        self.num_classes = num_classes
        self.num_gauss_hermite_points = 20
        if invlink is None:
            invlink = RobustMax(self.num_classes)
        if not isinstance(invlink, RobustMax):
            raise NotImplementedError("Only RobustMax invlink is supported")
        self.invlink = invlink

    @inherit_check_shapes
    def _log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        F = jnp.asarray(F)
        Y = jnp.asarray(Y)
        hits = jnp.argmax(F, axis=1)[:, None] == Y.astype(jnp.int64)
        eps = self.invlink.epsilon.value
        p = jnp.where(hits, 1.0 - eps, self.invlink.eps_k1)
        return jnp.sum(jnp.log(p), axis=-1)

    @inherit_check_shapes
    def _variational_expectations(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        gh_x, gh_w = np.polynomial.hermite.hermgauss(self.num_gauss_hermite_points)
        p = self.invlink.prob_is_largest(Y, jnp.asarray(Fmu), jnp.asarray(Fvar), gh_x, gh_w)
        eps = self.invlink.epsilon.value
        ve = p * jnp.log(1.0 - eps) + (1.0 - p) * jnp.log(self.invlink.eps_k1)
        return jnp.sum(ve, axis=-1)

    @inherit_check_shapes
    def _predict_mean_and_var(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType
    ) -> MeanAndVariance:
        N = jnp.shape(Fmu)[0]
        ps = [
            self._predict_non_logged_density(
                X, Fmu, Fvar, jnp.full((N, 1), i, dtype=jnp.int64)
            ).reshape(-1)
            for i in range(self.num_classes)
        ]
        ps = jnp.stack(ps, axis=-1)  # [N, K]
        return ps, ps - jnp.square(ps)

    @inherit_check_shapes
    def _predict_log_density(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        return jnp.sum(jnp.log(self._predict_non_logged_density(X, Fmu, Fvar, Y)), axis=-1)

    @check_shapes(
        "X: [broadcast batch..., input_dim]",
        "Fmu: [broadcast batch..., latent_dim]",
        "Fvar: [broadcast batch..., latent_dim]",
        "Y: [broadcast batch..., observation_dim]",
        "return: [batch..., observation_dim]",
    )
    def _predict_non_logged_density(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        gh_x, gh_w = np.polynomial.hermite.hermgauss(self.num_gauss_hermite_points)
        p = self.invlink.prob_is_largest(Y, jnp.asarray(Fmu), jnp.asarray(Fvar), gh_x, gh_w)
        eps = self.invlink.epsilon.value
        return p * (1.0 - eps) + (1.0 - p) * self.invlink.eps_k1

    @inherit_check_shapes
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        return self.invlink(F)

    @inherit_check_shapes
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        p = self.conditional_mean(X, F)
        return p - jnp.square(p)
