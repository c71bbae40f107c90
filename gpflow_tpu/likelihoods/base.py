"""Likelihood base hierarchy (reference ``/root/reference/gpflow/likelihoods/base.py``).

Shape contract (reference ``base.py:31-60``): the last dimension of F holds
latent functions and of Y one observation; all statistics return the
broadcast batch shape with those trailing dims reduced.

Deviation (SURVEY.md A.5.3): ``SwitchedLikelihood`` re-expresses the
``tf.dynamic_partition``/``dynamic_stitch`` pattern with one-hot masking over
statically-shaped full-batch evaluations of every sub-likelihood — the
jit/TPU-compatible formulation (no data-dependent shapes).
"""
from __future__ import annotations

import abc
from typing import Any, Callable, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..base import MeanAndVariance, Module, TensorType
from ..quadrature import GaussianQuadrature, NDiagGHQuadrature, ndiag_mc
from ..utilities.shapes import check_shapes, inherit_check_shapes

__all__ = [
    "DEFAULT_NUM_GAUSS_HERMITE_POINTS",
    "Likelihood",
    "MonteCarloLikelihood",
    "QuadratureLikelihood",
    "ScalarLikelihood",
    "SwitchedLikelihood",
]

DEFAULT_NUM_GAUSS_HERMITE_POINTS = 20
"""Fallback Gauss-Hermite resolution (reference ``base.py:23-28``)."""


class Likelihood(Module, abc.ABC):
    """Observation model p(Y | X, F) (reference ``base.py:31-276``)."""

    def __init__(
        self,
        input_dim: Optional[int],
        latent_dim: Optional[int],
        observation_dim: Optional[int],
    ) -> None:
        self.input_dim = input_dim
        self.latent_dim = latent_dim
        self.observation_dim = observation_dim

    @check_shapes(
        "F: [batch..., Q]",
        "Y: [batch_y..., R]",
        "return: [batch...]",
    )
    def log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        """log p(Y | X, F) -> [batch...]."""
        return self._log_prob(X, F, Y)

    @abc.abstractmethod
    @check_shapes(
        "F: [batch..., Q]",
        "Y: [batch_y..., R]",
        "return: [batch...]",
    )
    def _log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        raise NotImplementedError

    @check_shapes(
        "F: [batch..., Q]",
        "return: [batch..., R]",
    )
    def conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        """E[Y | X, F] -> [batch..., observation_dim]."""
        return self._conditional_mean(X, F)

    @check_shapes(
        "F: [batch..., Q]",
        "return: [batch..., R]",
    )
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        raise NotImplementedError

    @check_shapes(
        "F: [batch..., Q]",
        "return: [batch..., R]",
    )
    def conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        """var[Y | X, F] -> [batch..., observation_dim]."""
        return self._conditional_variance(X, F)

    @check_shapes(
        "F: [batch..., Q]",
        "return: [batch..., R]",
    )
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        raise NotImplementedError

    @check_shapes(
        "Fmu: [batch..., Q]",
        "Fvar: [batch..., Q]",
        "return[0]: [batch..., R]",
        "return[1]: [batch..., R]",
    )
    def predict_mean_and_var(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType
    ) -> MeanAndVariance:
        """Mean/variance of Y under q(f)=N(Fmu, Fvar) (reference ``base.py:135-170``)."""
        return self._predict_mean_and_var(X, Fmu, Fvar)

    @abc.abstractmethod
    @check_shapes(
        "Fmu: [batch..., Q]",
        "Fvar: [batch..., Q]",
        "return[0]: [batch..., R]",
        "return[1]: [batch..., R]",
    )
    def _predict_mean_and_var(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType
    ) -> MeanAndVariance:
        raise NotImplementedError

    @check_shapes(
        "Fmu: [batch..., Q]",
        "Fvar: [batch..., Q]",
        "Y: [batch_y..., R]",
        "return: [batch...]",
    )
    def predict_log_density(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        """log int p(Y|F) q(F) dF -> [batch...] (reference ``base.py:186-215``)."""
        return self._predict_log_density(X, Fmu, Fvar, Y)

    @abc.abstractmethod
    @check_shapes(
        "Fmu: [batch..., Q]",
        "Fvar: [batch..., Q]",
        "Y: [batch_y..., R]",
        "return: [batch...]",
    )
    def _predict_log_density(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        raise NotImplementedError

    @check_shapes(
        "Fmu: [batch..., Q]",
        "Fvar: [batch..., Q]",
        "Y: [batch_y..., R]",
        "return: [batch...]",
    )
    def variational_expectations(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        """int log p(Y|f) q(f) df -> [batch...] (reference ``base.py:236-266``)."""
        return self._variational_expectations(X, Fmu, Fvar, Y)

    @abc.abstractmethod
    @check_shapes(
        "Fmu: [batch..., Q]",
        "Fvar: [batch..., Q]",
        "Y: [batch_y..., R]",
        "return: [batch...]",
    )
    def _variational_expectations(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        raise NotImplementedError


class QuadratureLikelihood(Likelihood, abc.ABC):
    """Plugs Gauss-Hermite quadrature in as a generic fallback for all three
    Gaussian integrals (reference ``base.py:279-400``)."""

    def __init__(
        self,
        input_dim: Optional[int],
        latent_dim: Optional[int],
        observation_dim: Optional[int],
        *,
        quadrature: Optional[GaussianQuadrature] = None,
    ) -> None:
        super().__init__(
            input_dim=input_dim, latent_dim=latent_dim, observation_dim=observation_dim
        )
        if quadrature is None:
            quadrature = NDiagGHQuadrature(self._quadrature_dim, DEFAULT_NUM_GAUSS_HERMITE_POINTS)
        self.quadrature = quadrature

    @property
    def _quadrature_dim(self) -> int:
        assert self.latent_dim is not None
        return self.latent_dim

    @check_shapes(
        "F: [broadcast batch..., latent_dim]",
        "X: [broadcast batch..., input_dim]",
        "Y: [broadcast batch..., observation_dim]",
        "return: [batch..., d]",
    )
    def _quadrature_log_prob(self, F: TensorType, X: TensorType, Y: TensorType) -> jax.Array:
        # quadrature integrands return [...] + [d']; here d'=1 (reference
        # ``base.py:310-326``)
        return jnp.expand_dims(self.log_prob(X, F, Y), axis=-1)

    @check_shapes(
        "quadrature_result: [batch..., d]",
        "return: [batch...]",
    )
    def _quadrature_reduction(self, quadrature_result: jax.Array) -> jax.Array:
        return jnp.squeeze(quadrature_result, axis=-1)

    @inherit_check_shapes
    def _predict_log_density(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        return self._quadrature_reduction(
            self.quadrature.logspace(self._quadrature_log_prob, Fmu, Fvar, X=X, Y=Y)
        )

    @inherit_check_shapes
    def _variational_expectations(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        return self._quadrature_reduction(
            self.quadrature(self._quadrature_log_prob, Fmu, Fvar, X=X, Y=Y)
        )

    @inherit_check_shapes
    def _predict_mean_and_var(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType
    ) -> MeanAndVariance:
        def conditional_mean(F: TensorType, X_: TensorType) -> jax.Array:
            return self.conditional_mean(X_, F)

        def conditional_y_squared(F: TensorType, X_: TensorType) -> jax.Array:
            return self.conditional_variance(X_, F) + jnp.square(self.conditional_mean(X_, F))

        E_y, E_y2 = self.quadrature([conditional_mean, conditional_y_squared], Fmu, Fvar, X_=X)
        V_y = E_y2 - E_y ** 2
        return E_y, V_y


class ScalarLikelihood(QuadratureLikelihood, abc.ABC):
    """Per-scalar-latent likelihoods: implements ``_scalar_log_prob`` and sums
    over the last axis (reference ``base.py:403-483``)."""

    #: an observation value with finite log-prob under this likelihood, used
    #: by SwitchedLikelihood to substitute non-selected rows (0.5 is valid for
    #: every built-in scalar likelihood: real, positive, (0,1), count, binary)
    safe_observation: float = 0.5

    def __init__(self, **kwargs: Any) -> None:
        super().__init__(input_dim=None, latent_dim=None, observation_dim=None, **kwargs)

    @inherit_check_shapes
    def _log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        return jnp.sum(self._scalar_log_prob(X, F, Y), axis=-1)

    @abc.abstractmethod
    @check_shapes(
        # Y gets its own dim: SwitchedLikelihood's Y carries an extra index
        # column (reference ``base.py:439-444`` uses distinct latent_dim /
        # observation_dim variables for the same reason)
        "X: [broadcast batch..., N, D]",
        "F: [broadcast batch..., N, P]",
        "Y: [broadcast batch..., N, Q]",
        "return: [batch..., N, P]",
    )
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        raise NotImplementedError

    @property
    def _quadrature_dim(self) -> int:
        # 1-D quadrature broadcast over latent dims (reference ``base.py:449-457``)
        return 1

    @inherit_check_shapes
    def _quadrature_log_prob(self, F: TensorType, X: TensorType, Y: TensorType) -> jax.Array:
        # d' is the shared last dim of F and Y; _scalar_log_prob broadcasts
        # over it (reference ``base.py:458-469``)
        return self._scalar_log_prob(X, F, Y)

    @inherit_check_shapes
    def _quadrature_reduction(self, quadrature_result: jax.Array) -> jax.Array:
        return jnp.sum(quadrature_result, axis=-1)


class SwitchedLikelihood(ScalarLikelihood):
    """The last column of Y holds an integer selecting the likelihood per
    datum (reference ``base.py:486-561``); see module docstring for the
    masked static-shape formulation.

    Every sub-likelihood is evaluated on the full batch; rows belonging to
    *other* likelihoods have their observation substituted by the evaluated
    likelihood's ``safe_observation`` (a value with finite log-prob for every
    built-in likelihood) and the result is selected per row with
    ``jnp.where`` — so out-of-support observations under non-selected
    branches can neither poison the values nor the gradients.
    """

    def __init__(self, likelihood_list: Iterable[ScalarLikelihood], **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.likelihoods = list(likelihood_list)

    # No return spec: the dispatched method returns [batch...] (log_prob,
    # predict_log_density) or [batch..., P] (conditional moments) depending
    # on func_name, and a second anonymous variadic ("[batch..., ...]") is
    # never bindable — the checker would silently skip it, documenting
    # coverage that does not exist. Each public caller carries the precise
    # contract instead.
    @check_shapes(
        "args[all]: [batch..., .]",
    )
    def _masked_apply(self, args: Sequence[TensorType], func_name: str) -> jax.Array:
        args_list = [jnp.asarray(a) for a in args]
        Y = args_list[-1]
        ind = Y[..., -1].astype(jnp.int32)  # [batch...]
        Ydata = Y[..., :-1]
        results = []
        for k, lik in enumerate(self.likelihoods):
            selected = (ind == k)[..., None]  # [batch..., 1]
            safe = jnp.asarray(getattr(lik, "safe_observation", 0.5), Ydata.dtype)
            Y_safe = jnp.where(selected, Ydata, safe)
            results.append(getattr(lik, func_name)(*args_list[:-1], Y_safe))
        stacked = jnp.stack(results, axis=0)  # [K, batch..., (latent)]
        mask_bool = ind[None, ...] == jnp.arange(len(self.likelihoods)).reshape(
            (-1,) + (1,) * ind.ndim
        )
        mask_bool = mask_bool.reshape(mask_bool.shape + (1,) * (stacked.ndim - mask_bool.ndim))
        out = jnp.sum(jnp.where(mask_bool, stacked, jnp.zeros((), stacked.dtype)), axis=0)
        # An index outside [0, K) matches no mask, which would silently
        # return 0 (log-probability 1!) for that row. The reference's
        # tf.dynamic_partition raises instead; inside jit the loud
        # jit-compatible equivalent is NaN-poisoning the invalid rows so the
        # loss/gradients surface the bad labels immediately.
        valid = (ind >= 0) & (ind < len(self.likelihoods))
        valid = valid.reshape(valid.shape + (1,) * (out.ndim - valid.ndim))
        return jnp.where(valid, out, jnp.asarray(jnp.nan, out.dtype))

    @inherit_check_shapes
    def _scalar_log_prob(self, X: TensorType, F: TensorType, Y: TensorType) -> jax.Array:
        return self._masked_apply([X, F, Y], "_scalar_log_prob")

    @inherit_check_shapes
    def _predict_log_density(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        return self._masked_apply([X, Fmu, Fvar, Y], "predict_log_density")

    @inherit_check_shapes
    def _variational_expectations(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, Y: TensorType
    ) -> jax.Array:
        return self._masked_apply([X, Fmu, Fvar, Y], "variational_expectations")

    @inherit_check_shapes
    def _predict_mean_and_var(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType
    ) -> MeanAndVariance:
        mvs = [lik.predict_mean_and_var(X, Fmu, Fvar) for lik in self.likelihoods]
        mu_list, var_list = zip(*mvs)
        mu = jnp.concatenate(mu_list, axis=1)
        var = jnp.concatenate(var_list, axis=1)
        return mu, var

    @check_shapes(
        "F: [batch..., Q]",
        "return: [batch..., R]",
    )
    def _conditional_mean(self, X: TensorType, F: TensorType) -> jax.Array:
        raise NotImplementedError

    @check_shapes(
        "F: [batch..., Q]",
        "return: [batch..., R]",
    )
    def _conditional_variance(self, X: TensorType, F: TensorType) -> jax.Array:
        raise NotImplementedError


class MonteCarloLikelihood(Likelihood):
    """Generic Monte-Carlo fallback, 100 samples (reference ``base.py:564-696``)."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        self.num_monte_carlo_points = 100

    @check_shapes(
        "Fmu: [batch..., latent_dim]",
        "Fvar: [batch..., latent_dim]",
        "Ys.values(): [batch..., .]",
        "return: [broadcast n_funcs, batch..., .]",
    )
    def _mc_quadrature(
        self,
        funcs: Union[Callable[..., jax.Array], Iterable[Callable[..., jax.Array]]],
        Fmu: TensorType,
        Fvar: TensorType,
        logspace: bool = False,
        epsilon: Optional[TensorType] = None,
        **Ys: TensorType,
    ) -> Any:
        return ndiag_mc(
            funcs, self.num_monte_carlo_points, jnp.asarray(Fmu), jnp.asarray(Fvar),
            logspace, epsilon, **Ys,
        )

    @inherit_check_shapes
    def _predict_mean_and_var(
        self, X: TensorType, Fmu: TensorType, Fvar: TensorType, epsilon: Optional[TensorType] = None
    ) -> MeanAndVariance:
        def conditional_mean(F: TensorType, X_: TensorType) -> jax.Array:
            return self.conditional_mean(X_, F)

        def conditional_y_squared(F: TensorType, X_: TensorType) -> jax.Array:
            return self.conditional_variance(X_, F) + jnp.square(self.conditional_mean(X_, F))

        E_y, E_y2 = self._mc_quadrature(
            [conditional_mean, conditional_y_squared], Fmu, Fvar, epsilon=epsilon, X_=X
        )
        V_y = E_y2 - jnp.square(E_y)
        return E_y, V_y

    @inherit_check_shapes
    def _predict_log_density(
        self,
        X: TensorType,
        Fmu: TensorType,
        Fvar: TensorType,
        Y: TensorType,
        epsilon: Optional[TensorType] = None,
    ) -> jax.Array:
        def log_prob(F: TensorType, X_: TensorType, Y_: TensorType) -> jax.Array:
            return self.log_prob(X_, F, Y_)

        return jnp.sum(
            self._mc_quadrature(log_prob, Fmu, Fvar, logspace=True, epsilon=epsilon, X_=X, Y_=Y),
            axis=-1,
        )

    @inherit_check_shapes
    def _variational_expectations(
        self,
        X: TensorType,
        Fmu: TensorType,
        Fvar: TensorType,
        Y: TensorType,
        epsilon: Optional[TensorType] = None,
    ) -> jax.Array:
        def log_prob(F: TensorType, X_: TensorType, Y_: TensorType) -> jax.Array:
            return self.log_prob(X_, F, Y_)

        return jnp.sum(
            self._mc_quadrature(log_prob, Fmu, Fvar, epsilon=epsilon, X_=X, Y_=Y), axis=-1
        )
