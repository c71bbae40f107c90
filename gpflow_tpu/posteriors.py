"""Posterior classes with precomputed prediction caches
(reference ``/root/reference/gpflow/posteriors.py``, 1108 LoC — the largest
file in the reference; SURVEY.md §2.8/A.1/A.2).

Cache designs (exact formulas at reference ``posteriors.py:694-746``):
  * GPRPosterior:  cache = (err, Lm of K+sigma^2 I)
  * SGPRPosterior: cache = (L, LB, c)
  * VGPPosterior:  cache = (Lm,)
  * BasePosterior: cache = (alpha, Qinv); prediction is then pure matmul:
    mean = Kuf^T alpha, cov = Kff - Kuf^T Qinv Kuf — the MXU-only fast path.

Deviation (SURVEY.md A.5.2): ``PrecomputeCacheType.VARIABLE`` recomputes the
cache into fresh arrays — functional JAX has no in-place variables inside a
kept graph; jit re-use comes for free from stable treedefs instead.

Conditioning note: the (alpha, Qinv) cache stores an EXPLICIT inverse (as
the reference does), so its predictive variance carries a ~cond(Kuu)^2 * eps
error relative to the fused Cholesky pipeline. Measured envelopes
(tests/gpflow_tpu/test_error_envelopes.py + tools/envelope_fuzz.py on TPU):
at f64, < 1e-10 for cond <= 1e3 and ~1e-9 even at the jitter-floor
conditioning (~3e7); at f32 the quadratic envelope bites early — already
~1e-3 absolute at cond ~1e2 (1e2^2 * eps32), saturating ~4e-3 at the f32
jitter floor. For accuracy-critical f32 serving prefer ``fused_predict_f``
(Cholesky pipeline, ~cond * eps error) or compute the cache in f64.
"""
from __future__ import annotations

import enum
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Optional, Tuple, Type, Union, cast

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from . import kernels
from .base import MeanAndVariance, Module, Parameter, RegressionData, TensorType
from .conditionals.util import (
    base_conditional,
    base_conditional_with_lm,
    expand_independent_outputs,
    fully_correlated_conditional,
    independent_interdomain_conditional,
    mix_latent_gp,
    separate_independent_conditional_implementation,
)
from .config import default_float, default_jitter
from .covariances import Kuf, Kuu
from .functions import MeanFunction
from .inducing_variables import (
    FallbackSeparateIndependentInducingVariables,
    FallbackSharedIndependentInducingVariables,
    InducingPoints,
    InducingVariables,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)
from .kernels import Kernel
from .likelihoods import Gaussian
from .utilities import Dispatcher, add_likelihood_noise_cov, assert_params_false
from .utilities.shapes import check_shapes, inherit_check_shapes

__all__ = [
    "AbstractPosterior",
    "BasePosterior",
    "FallbackIndependentLatentPosterior",
    "FullyCorrelatedPosterior",
    "GPRPosterior",
    "IndependentPosterior",
    "IndependentPosteriorMultiOutput",
    "IndependentPosteriorSingleOutput",
    "LinearCoregionalizationPosterior",
    "PrecomputeCacheType",
    "PrecomputedValue",
    "SGPRPosterior",
    "VGPPosterior",
    "create_posterior",
    "get_posterior_class",
    "get_precomputed_value_shape",
]


def _value(x):
    return x.value if isinstance(x, Parameter) else jnp.asarray(x) if x is not None else None


class _QDistribution(Module):
    """Internal q(u) parametrization (reference ``posteriors.py:58-94``)."""


class _DeltaDist(_QDistribution):
    @check_shapes(
        "q_mu: [M, L]",
    )
    def __init__(self, q_mu: TensorType) -> None:
        self.q_mu = q_mu

    @property
    def q_sqrt(self) -> Optional[jax.Array]:
        return None


class _DiagNormal(_QDistribution):
    @check_shapes(
        "q_mu: [M, L]",
        "q_sqrt: [M, L]",
    )
    def __init__(self, q_mu: TensorType, q_sqrt: TensorType) -> None:
        self.q_mu = q_mu
        self.q_sqrt = q_sqrt


class _MvNormal(_QDistribution):
    @check_shapes(
        "q_mu: [M, L]",
        "q_sqrt: [L, M, M]",
    )
    def __init__(self, q_mu: TensorType, q_sqrt: TensorType) -> None:
        self.q_mu = q_mu
        self.q_sqrt = q_sqrt


class PrecomputeCacheType(enum.Enum):
    """TENSOR precomputes into arrays; VARIABLE is accepted for API parity and
    behaves as TENSOR (see module docstring); NOCACHE skips precomputation
    (reference ``posteriors.py:97-114``)."""

    TENSOR = "tensor"
    VARIABLE = "variable"
    NOCACHE = "nocache"


@dataclass
class PrecomputedValue:
    """Cache entry + per-axis may-resize flags (reference ``posteriors.py:117-169``;
    informational here since JAX recompiles on shape change)."""

    value: jax.Array
    axis_dynamic: Tuple[bool, ...]

    @staticmethod
    def shape_of(value: "PrecomputedValue") -> Tuple[Optional[int], ...]:
        """Shape with dynamic axes reported as unknown (``None``), as in the
        reference's ``get_precomputed_value_shape`` (``posteriors.py:172-177``)."""
        return tuple(
            None if dyn else int(s)
            for s, dyn in zip(jnp.shape(value.value), value.axis_dynamic)
        )

    @staticmethod
    @check_shapes(
        "alpha: [M, L] | [L, M, 1]",
        "Qinv: [M, M] | [L, M, M]",
    )
    def wrap_alpha_Qinv(alpha: TensorType, Qinv: TensorType) -> Tuple["PrecomputedValue", ...]:
        alpha_dynamic = (False,) * jnp.ndim(alpha)
        Qinv_dynamic = (False,) * jnp.ndim(Qinv)
        return (
            PrecomputedValue(alpha, alpha_dynamic),
            PrecomputedValue(Qinv, Qinv_dynamic),
        )


from .utilities.shapes import register_get_shape  # noqa: E402


@register_get_shape(PrecomputedValue)
def get_precomputed_value_shape(shaped: PrecomputedValue) -> Tuple[Optional[int], ...]:
    """Shape extractor for the shape-contract system (reference
    ``posteriors.py:172-177``): dynamic axes report as unknown."""
    return PrecomputedValue.shape_of(shaped)


def _validate_precompute_cache_type(
    value: Union[None, PrecomputeCacheType, str]
) -> PrecomputeCacheType:
    if value is None:
        return PrecomputeCacheType.NOCACHE
    if isinstance(value, PrecomputeCacheType):
        return value
    if isinstance(value, str):
        return PrecomputeCacheType(value.lower())
    raise ValueError(
        f"{value} is not a valid PrecomputeCacheType."
        " Valid options: 'tensor', 'variable', 'nocache' (or None)."
    )


class AbstractPosterior(Module, ABC):
    """Fused (no cache) vs cached prediction (reference ``posteriors.py:193-358``)."""

    @check_shapes(
        "X_data: [N, D] | [M, D, broadcast P]",
    )
    def __init__(
        self,
        kernel: Kernel,
        X_data: Union[jax.Array, InducingVariables],
        cache: Optional[Tuple[jax.Array, ...]] = None,
        mean_function: Optional[MeanFunction] = None,
    ) -> None:
        self.kernel = kernel
        self.X_data = X_data
        self.cache = cache
        self.mean_function = mean_function
        self._precompute_cache: Optional[PrecomputeCacheType] = None

    @check_shapes(
        "Xnew: [batch..., D]",
        "mean: [batch..., Q]",
        "return: [batch..., Q]",
    )
    def _add_mean_function(self, Xnew: TensorType, mean: jax.Array) -> jax.Array:
        if self.mean_function is None:
            return mean
        return mean + self.mean_function(Xnew)

    @abstractmethod
    def _precompute(self) -> Tuple[PrecomputedValue, ...]:
        """Computes the cache later consumed by _conditional_with_precompute."""

    @check_shapes(
        "Xnew: [batch..., N, D]",
        "return[0]: [batch..., N, P]",
        "return[1]: [batch..., N, P] if (not full_cov) and (not full_output_cov)",
        "return[1]: [batch..., P, N, N] if full_cov and (not full_output_cov)",
        "return[1]: [batch..., N, P, P] if (not full_cov) and full_output_cov",
        "return[1]: [batch..., N, P, N, P] if full_cov and full_output_cov",
    )
    def fused_predict_f(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """Mean/cov at Xnew including mean_function; no cache used."""
        mean, cov = self._conditional_fused(
            Xnew, full_cov=full_cov, full_output_cov=full_output_cov
        )
        return self._add_mean_function(Xnew, mean), cov

    @abstractmethod
    @check_shapes(
        "Xnew: [batch..., N, D]",
        "return[0]: [batch..., N, P]",
        "return[1]: [batch..., N, P] if (not full_cov) and (not full_output_cov)",
        "return[1]: [batch..., P, N, N] if full_cov and (not full_output_cov)",
        "return[1]: [batch..., N, P, P] if (not full_cov) and full_output_cov",
        "return[1]: [batch..., N, P, N, P] if full_cov and full_output_cov",
    )
    def _conditional_fused(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """Mean/cov at Xnew excluding mean_function; no cache used."""

    @check_shapes(
        "Xnew: [batch..., N, D]",
        "return[0]: [batch..., N, P]",
        "return[1]: [batch..., N, P] if (not full_cov) and (not full_output_cov)",
        "return[1]: [batch..., P, N, N] if full_cov and (not full_output_cov)",
        "return[1]: [batch..., N, P, P] if (not full_cov) and full_output_cov",
        "return[1]: [batch..., N, P, N, P] if full_cov and full_output_cov",
    )
    def predict_f(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """Mean/cov at Xnew including mean_function, from the precomputed cache
        — matmuls only, no Cholesky at predict time."""
        if self.cache is None:
            raise ValueError(
                "Cache has not been precomputed yet. Call update_cache first or use fused_predict_f"
            )
        mean, cov = self._conditional_with_precompute(
            self.cache, Xnew, full_cov=full_cov, full_output_cov=full_output_cov
        )
        return self._add_mean_function(Xnew, mean), cov

    @abstractmethod
    @check_shapes(
        "Xnew: [batch..., N, D]",
        "return[0]: [batch..., N, P]",
        "return[1]: [batch..., N, P] if (not full_cov) and (not full_output_cov)",
        "return[1]: [batch..., P, N, N] if full_cov and (not full_output_cov)",
        "return[1]: [batch..., N, P, P] if (not full_cov) and full_output_cov",
        "return[1]: [batch..., N, P, N, P] if full_cov and full_output_cov",
    )
    def _conditional_with_precompute(
        self,
        cache: Tuple[jax.Array, ...],
        Xnew: TensorType,
        full_cov: bool = False,
        full_output_cov: bool = False,
    ) -> MeanAndVariance:
        """Mean/cov at Xnew excluding mean_function, from cached values."""

    def predict_mean(self, Xnew: TensorType) -> jax.Array:
        """Predictive mean only (TPU-serving extension; not in the reference
        API). Subclasses override the cached path to skip the variance work
        entirely — for the (alpha, Qinv) posteriors that drops the dominant
        O(M^2 N) Qinv contraction and serves mean-only batches at the cost of
        one [N, M] x [M, L] matmul. Without a cache this falls back to the
        fused conditional and discards the variance."""
        if self.cache is None:
            mean, _ = self.fused_predict_f(Xnew)
        else:
            mean, _ = self.predict_f(Xnew)
        return mean

    def update_cache(self, precompute_cache: Optional[PrecomputeCacheType] = None) -> None:
        """(Re)computes or clears the cache (reference ``posteriors.py:322-358``)."""
        if precompute_cache is None:
            if self._precompute_cache is None:
                raise ValueError(
                    "You must pass precompute_cache explicitly"
                    " (the cache had not been updated before)."
                )
            precompute_cache = self._precompute_cache
        else:
            precompute_cache = _validate_precompute_cache_type(precompute_cache)
            self._precompute_cache = precompute_cache

        if precompute_cache is PrecomputeCacheType.NOCACHE:
            self.cache = None
        else:  # TENSOR and VARIABLE both precompute into arrays
            self.cache = tuple(c.value for c in self._precompute())


class GPRPosterior(AbstractPosterior):
    """Exact-GP posterior; cache = (err, Lm) (reference ``posteriors.py:361-443``)."""

    @check_shapes(
        "data[0]: [N, D]",
        "data[1]: [N, Q]",
    )
    def __init__(
        self,
        kernel: Kernel,
        data: RegressionData,
        likelihood: Gaussian,
        mean_function: MeanFunction,
        *,
        precompute_cache: Optional[PrecomputeCacheType],
    ) -> None:
        X, Y = data
        super().__init__(kernel, X, mean_function=mean_function)
        self.Y_data = Y
        self.likelihood = likelihood
        if precompute_cache is not None:
            self.update_cache(precompute_cache)

    @inherit_check_shapes
    def _conditional_with_precompute(
        self,
        cache: Tuple[jax.Array, ...],
        Xnew: TensorType,
        full_cov: bool = False,
        full_output_cov: bool = False,
    ) -> MeanAndVariance:
        assert_params_false(self._conditional_with_precompute, full_output_cov=full_output_cov)
        err, Lm = cache[0], cache[1]
        Knn = self.kernel(Xnew, full_cov=full_cov)
        Kmn = self.kernel(self.X_data, Xnew)
        return base_conditional_with_lm(
            Kmn=Kmn, Lm=Lm, Knn=Knn, f=err, full_cov=full_cov, q_sqrt=None, white=False
        )

    def predict_mean(self, Xnew: TensorType) -> jax.Array:
        """mean = Knm alpha with alpha = (Kmm + sigma^2 I)^-1 err read from
        the cache: predict-time work is the [N, Nnew] Kmn build plus one
        matvec — no solves."""
        if self.cache is None:
            return super().predict_mean(Xnew)
        alpha = self.cache[2]
        Kmn = self.kernel(self.X_data, Xnew)
        mean = jnp.matmul(jnp.swapaxes(Kmn, -1, -2), alpha)
        return self._add_mean_function(Xnew, mean)

    @check_shapes(
        "return[0]: [M, D]",
        "return[1]: [M, M]",
    )
    def _precompute_base(self) -> Tuple[PrecomputedValue, ...]:
        """(err, Lm) — everything the full conditional needs."""
        assert self.mean_function is not None
        X_data = cast(jax.Array, self.X_data)
        err = self.Y_data - self.mean_function(X_data)
        Kmm = self.kernel(X_data)
        Kmm_plus_s = add_likelihood_noise_cov(Kmm, self.likelihood, X_data)
        Lm = jnp.linalg.cholesky(Kmm_plus_s)
        return (
            PrecomputedValue(err, (False, False)),
            PrecomputedValue(Lm, (False, False)),
        )

    @check_shapes(
        "return[0]: [M, D]",
        "return[1]: [M, M]",
        "return[2]: [M, D]",
    )
    def _precompute(self) -> Tuple[PrecomputedValue, ...]:
        err_v, Lm_v = self._precompute_base()
        err, Lm = err_v.value, Lm_v.value
        # alpha = (K + sigma^2 I)^-1 err, cached so mean-only serving is one
        # matvec (extension over the reference's (err, Lm) cache; computed
        # only here, not on the fused/NOCACHE path)
        alpha = solve_triangular(
            Lm, solve_triangular(Lm, err, lower=True), lower=True, trans=1
        )
        return (err_v, Lm_v, PrecomputedValue(alpha, (False, False)))

    @inherit_check_shapes
    def _conditional_fused(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        temp_cache = tuple(c.value for c in self._precompute_base())
        return self._conditional_with_precompute(temp_cache, Xnew, full_cov, full_output_cov)


class SGPRPosterior(AbstractPosterior):
    """SGPR posterior; cache = (L, LB, c) (reference ``posteriors.py:446-562``)."""

    @check_shapes(
        "data[0]: [N, D]",
        "data[1]: [N, Q]",
        "inducing_variable: [M, D, 1]",
    )
    def __init__(
        self,
        kernel: Kernel,
        data: RegressionData,
        inducing_variable: InducingPoints,
        likelihood: Gaussian,
        num_latent_gps: int,
        mean_function: MeanFunction,
        *,
        precompute_cache: Optional[PrecomputeCacheType],
    ) -> None:
        X, Y = data
        super().__init__(kernel, X, mean_function=mean_function)
        self.Y_data = Y
        self.likelihood = likelihood
        self.inducing_variable = inducing_variable
        self.num_latent_gps = num_latent_gps
        if precompute_cache is not None:
            self.update_cache(precompute_cache)

    @inherit_check_shapes
    def _conditional_with_precompute(
        self,
        cache: Tuple[jax.Array, ...],
        Xnew: TensorType,
        full_cov: bool = False,
        full_output_cov: bool = False,
    ) -> MeanAndVariance:
        assert_params_false(self._conditional_with_precompute, full_output_cov=full_output_cov)
        L, LB, c = cache[0], cache[1], cache[2]
        Kus = Kuf(self.inducing_variable, self.kernel, Xnew)
        tmp1 = solve_triangular(L, Kus, lower=True)
        tmp2 = solve_triangular(LB, tmp1, lower=True)
        mean = jnp.matmul(jnp.swapaxes(tmp2, -1, -2), c)
        if full_cov:
            var = (
                self.kernel(Xnew)
                + jnp.matmul(jnp.swapaxes(tmp2, -1, -2), tmp2)
                - jnp.matmul(jnp.swapaxes(tmp1, -1, -2), tmp1)
            )
            var = jnp.broadcast_to(var[None, ...], (self.num_latent_gps,) + var.shape)
        else:
            var = (
                self.kernel(Xnew, full_cov=False)
                + jnp.sum(jnp.square(tmp2), 0)
                - jnp.sum(jnp.square(tmp1), 0)
            )
            var = jnp.broadcast_to(var[:, None], var.shape + (self.num_latent_gps,))
        return mean, var

    @check_shapes(
        "return[0]: [M, M]",
        "return[1]: [M, M]",
        "return[2]: [M, D]",
    )
    def _precompute_base(self) -> Tuple[PrecomputedValue, ...]:
        """(L, LB, c) — everything the full conditional needs."""
        assert self.mean_function is not None
        X_data = cast(jax.Array, self.X_data)
        num_inducing = self.inducing_variable.num_inducing
        err = self.Y_data - self.mean_function(X_data)

        kuf = Kuf(self.inducing_variable, self.kernel, X_data)
        kuu = Kuu(self.inducing_variable, self.kernel, jitter=default_jitter())

        sigma_sq = jnp.squeeze(self.likelihood.variance_at(X_data), axis=-1)
        sigma = jnp.sqrt(sigma_sq)

        L = jnp.linalg.cholesky(kuu)
        A = solve_triangular(L, kuf / sigma, lower=True)
        B = jnp.matmul(A, jnp.swapaxes(A, -1, -2)) + jnp.eye(num_inducing, dtype=default_float())
        LB = jnp.linalg.cholesky(B)
        Aerr = jnp.matmul(A, err / sigma[..., None])
        c = solve_triangular(LB, Aerr, lower=True)

        return (
            PrecomputedValue(L, (False, False)),
            PrecomputedValue(LB, (False, False)),
            PrecomputedValue(c, (False, False)),
        )

    @check_shapes(
        "return[0]: [M, M]",
        "return[1]: [M, M]",
        "return[2]: [M, D]",
        "return[3]: [M, D]",
    )
    def _precompute(self) -> Tuple[PrecomputedValue, ...]:
        L_v, LB_v, c_v = self._precompute_base()
        L, LB, c = L_v.value, LB_v.value, c_v.value
        # alpha = L^-T LB^-T c for one-matvec mean-only serving (extension
        # over the reference's (L, LB, c) cache; computed only here, not on
        # the fused/NOCACHE path)
        alpha = solve_triangular(
            L, solve_triangular(LB, c, lower=True, trans=1), lower=True, trans=1
        )
        return (L_v, LB_v, c_v, PrecomputedValue(alpha, (False, False)))

    def predict_mean(self, Xnew: TensorType) -> jax.Array:
        """mean = Kus^T L^-T LB^-T c: the [M, M] solves act on the [M, L]
        vector c rather than on the [M, Nnew] cross-covariance."""
        if self.cache is None:
            return super().predict_mean(Xnew)
        alpha = self.cache[3]
        Kus = Kuf(self.inducing_variable, self.kernel, Xnew)
        mean = jnp.matmul(jnp.swapaxes(Kus, -1, -2), alpha)
        return self._add_mean_function(Xnew, mean)

    @inherit_check_shapes
    def _conditional_fused(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        temp_cache = tuple(c.value for c in self._precompute_base())
        return self._conditional_with_precompute(temp_cache, Xnew, full_cov, full_output_cov)


class VGPPosterior(AbstractPosterior):
    """VGP posterior; cache = (Lm,) (reference ``posteriors.py:565-636``)."""

    @check_shapes(
        "X: [N, D]",
        "q_mu: [N, P]",
        "q_sqrt: [N, P] | [P, N, N]",
    )
    def __init__(
        self,
        kernel: Kernel,
        X: jax.Array,
        q_mu: TensorType,
        q_sqrt: TensorType,
        mean_function: Optional[MeanFunction] = None,
        white: bool = True,
        *,
        precompute_cache: Optional[PrecomputeCacheType],
    ) -> None:
        super().__init__(kernel, X, mean_function=mean_function)
        self.q_mu = q_mu
        self.q_sqrt = q_sqrt
        self.white = white
        if precompute_cache is not None:
            self.update_cache(precompute_cache)

    @inherit_check_shapes
    def _conditional_with_precompute(
        self,
        cache: Tuple[jax.Array, ...],
        Xnew: TensorType,
        full_cov: bool = False,
        full_output_cov: bool = False,
    ) -> MeanAndVariance:
        assert_params_false(self._conditional_with_precompute, full_output_cov=full_output_cov)
        (Lm,) = cache
        Kmn = self.kernel(self.X_data, Xnew)
        Knn = self.kernel(Xnew, full_cov=full_cov)
        return base_conditional_with_lm(
            Kmn=Kmn,
            Lm=Lm,
            Knn=Knn,
            f=_value(self.q_mu),
            full_cov=full_cov,
            q_sqrt=_value(self.q_sqrt),
            white=self.white,
        )

    @check_shapes(
        "return[0]: [M, M]",
    )
    def _precompute(self) -> Tuple[PrecomputedValue, ...]:
        X_data = cast(jax.Array, self.X_data)
        M = jnp.shape(X_data)[-2]
        Kmm = self.kernel(X_data) + default_jitter() * jnp.eye(
            M, dtype=jnp.asarray(X_data).dtype
        )
        Lm = jnp.linalg.cholesky(Kmm)
        return (PrecomputedValue(Lm, (False, False)),)

    @inherit_check_shapes
    def _conditional_fused(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        temp_cache = tuple(c.value for c in self._precompute())
        return self._conditional_with_precompute(temp_cache, Xnew, full_cov, full_output_cov)


class BasePosterior(AbstractPosterior):
    """q(u)-posterior with (alpha, Qinv) cache (reference ``posteriors.py:639-746``)."""

    @check_shapes(
        "inducing_variable: [M, D, broadcast P]",
        "q_mu: [N, P]",
        "q_sqrt: [N, P] | [P, N, N]",
    )
    def __init__(
        self,
        kernel: Kernel,
        inducing_variable: InducingVariables,
        q_mu: TensorType,
        q_sqrt: TensorType,
        whiten: bool = True,
        mean_function: Optional[MeanFunction] = None,
        *,
        precompute_cache: Optional[PrecomputeCacheType],
    ):
        super().__init__(kernel, inducing_variable, mean_function=mean_function)
        self.whiten = whiten
        self._set_qdist(q_mu, q_sqrt)
        if precompute_cache is not None:
            self.update_cache(precompute_cache)

    @property
    @check_shapes(
        "return: [N, P]",
    )
    def q_mu(self) -> jax.Array:
        return _value(self._q_dist.q_mu)

    @property
    @check_shapes(
        "return: [N, P] | [P, N, N]",
    )
    def q_sqrt(self) -> Optional[jax.Array]:
        return _value(self._q_dist.q_sqrt)

    @check_shapes(
        "q_mu: [N, P]",
        "q_sqrt: [N, P] | [P, N, N]",
    )
    def _set_qdist(self, q_mu: TensorType, q_sqrt: TensorType) -> None:
        if q_sqrt is None:
            self._q_dist: _QDistribution = _DeltaDist(q_mu)
        elif len(jnp.shape(_value(q_sqrt))) == 2:
            self._q_dist = _DiagNormal(q_mu, q_sqrt)
        else:
            self._q_dist = _MvNormal(q_mu, q_sqrt)

    @check_shapes(
        "return[0]: [M, L] | [L, M, 1]",
        "return[1]: [L, M, M]",
    )
    def _precompute(self) -> Tuple[PrecomputedValue, ...]:
        """Whitened: alpha = L^-T q_mu, Qinv = L^-T (I - S~) L^-1 with
        S~ = q_sqrt q_sqrt^T; unwhitened: S~ = L^-1 S L^-T
        (exact algebra at reference ``posteriors.py:694-746``)."""
        Kuu_val = Kuu(self.X_data, self.kernel, jitter=default_jitter())  # [(R), M, M]
        q_mu = self.q_mu

        if Kuu_val.ndim == 4:
            ML = Kuu_val.shape[0] * Kuu_val.shape[1]
            Kuu_val = jnp.reshape(Kuu_val, (ML, ML))
        if Kuu_val.ndim == 3:
            q_mu = jnp.swapaxes(self.q_mu, -1, -2)[..., None]  # [R, M, 1]
        L = jnp.linalg.cholesky(Kuu_val)

        if not self.whiten:
            # alpha = Kuu^-1 q_mu (via two triangular solves)
            alpha = solve_triangular(
                L, solve_triangular(L, q_mu, lower=True), lower=True, trans=1
            )
        else:
            # alpha = L^-T q_mu
            alpha = solve_triangular(L, q_mu, lower=True, trans=1)

        I = jnp.eye(L.shape[-1], dtype=L.dtype)
        if isinstance(self._q_dist, _DeltaDist):
            B = I
        else:
            q_sqrt = self.q_sqrt
            if not self.whiten:
                # Qinv = L^-T (I - L^-1 S L^-T) L^-1
                if isinstance(self._q_dist, _DiagNormal):
                    q_sqrt_full = jax.vmap(jnp.diag)(jnp.swapaxes(q_sqrt, -1, -2))  # [L, M, M]
                else:
                    q_sqrt_full = q_sqrt
                Linv_qsqrt = solve_triangular(
                    jnp.broadcast_to(L, q_sqrt_full.shape[:-2] + L.shape[-2:])
                    if q_sqrt_full.ndim == 3 and L.ndim == 2
                    else L,
                    q_sqrt_full,
                    lower=True,
                )
                Linv_cov_u_LinvT = jnp.matmul(Linv_qsqrt, jnp.swapaxes(Linv_qsqrt, -1, -2))
            else:
                if isinstance(self._q_dist, _DiagNormal):
                    Linv_cov_u_LinvT = jax.vmap(jnp.diag)(
                        jnp.swapaxes(q_sqrt ** 2, -1, -2)
                    )  # [L, M, M]
                else:
                    Linv_cov_u_LinvT = jnp.matmul(q_sqrt, jnp.swapaxes(q_sqrt, -1, -2))
            B = I - Linv_cov_u_LinvT

        if B.ndim == 2 and L.ndim == 3:
            # q_sqrt=None (DeltaDist) with batched [R, M, M] Kuu: a 2-D rhs
            # against a 3-D triangular factor would be read as a stack of
            # VECTORS (batch mismatch) — make the broadcast explicit
            B = jnp.broadcast_to(B, L.shape[:-2] + B.shape)
        L_b = jnp.broadcast_to(L, B.shape[:-2] + L.shape[-2:]) if B.ndim == 3 and L.ndim == 2 else L
        LinvT_B = solve_triangular(L_b, B, lower=True, trans=1)
        B_Linv = jnp.swapaxes(LinvT_B, -1, -2)
        Qinv = solve_triangular(L_b, B_Linv, lower=True, trans=1)

        M, num_L = self.q_mu.shape
        Qinv = jnp.broadcast_to(Qinv, (num_L,) + Qinv.shape[-2:])

        return PrecomputedValue.wrap_alpha_Qinv(alpha, Qinv)


class IndependentPosterior(BasePosterior):
    """reference ``posteriors.py:749-822``."""

    @check_shapes(
        "mean: [batch..., N, P]",
        "cov: [batch..., P, N, N] if full_cov",
        "cov: [batch..., N, P] if not full_cov",
        "return[0]: [batch..., N, P]",
        "return[1]: [batch..., N, P, N, P] if full_cov and full_output_cov",
        "return[1]: [batch..., N, P, P] if (not full_cov) and full_output_cov",
        "return[1]: [batch..., P, N, N] if full_cov and (not full_output_cov)",
        "return[1]: [batch..., N, P] if (not full_cov) and (not full_output_cov)",
    )
    def _post_process_mean_and_cov(
        self, mean: jax.Array, cov: jax.Array, full_cov: bool, full_output_cov: bool
    ) -> MeanAndVariance:
        return mean, expand_independent_outputs(cov, full_cov, full_output_cov)

    @check_shapes(
        "Xnew: [N, D]",
        "return: [P, N, N] | [N, N] if full_cov",
        "return: [P, N] | [N] if not full_cov",
    )
    def _get_Kff(self, Xnew: TensorType, full_cov: bool) -> jax.Array:
        if isinstance(self.kernel, (kernels.SeparateIndependent, kernels.IndependentLatent)):
            Kff = jnp.stack([k(Xnew, full_cov=full_cov) for k in self.kernel.kernels], axis=0)
        elif isinstance(self.kernel, kernels.MultioutputKernel):
            Kff = self.kernel.kernel(Xnew, full_cov=full_cov)
        else:
            Kff = self.kernel(Xnew, full_cov=full_cov)
        return Kff

    @inherit_check_shapes
    def _conditional_with_precompute(
        self,
        cache: Tuple[jax.Array, ...],
        Xnew: TensorType,
        full_cov: bool = False,
        full_output_cov: bool = False,
    ) -> MeanAndVariance:
        alpha, Qinv = cache  # alpha: [M, L] or [L, M, 1]; Qinv: [L, M, M]

        Kuf_val = Kuf(self.X_data, self.kernel, Xnew)  # [(R), M, N]
        Kff = self._get_Kff(Xnew, full_cov)

        mean = jnp.matmul(jnp.swapaxes(Kuf_val, -1, -2), alpha)
        if Kuf_val.ndim == 3:
            mean = jnp.swapaxes(jnp.squeeze(mean, axis=-1), -1, -2)  # [N, L]

        if full_cov:
            Kfu_Qinv_Kuf = jnp.matmul(
                jnp.swapaxes(Kuf_val, -1, -2), jnp.matmul(Qinv, Kuf_val)
            )
            cov = Kff - Kfu_Qinv_Kuf
        else:
            Kfu_Qinv_Kuf = jnp.sum(Kuf_val * jnp.matmul(Qinv, Kuf_val), axis=-2)
            cov = Kff - Kfu_Qinv_Kuf
            cov = jnp.swapaxes(cov, -1, -2)

        return self._post_process_mean_and_cov(mean, cov, full_cov, full_output_cov)

    def _mix_mean(self, mean: jax.Array) -> jax.Array:
        return mean

    def predict_mean(self, Xnew: TensorType) -> jax.Array:
        """mean = Kuf^T alpha: skips the O(M^2 N) Qinv contraction."""
        if self.cache is None:
            return super().predict_mean(Xnew)
        alpha, _ = self.cache
        Kuf_val = Kuf(self.X_data, self.kernel, Xnew)  # [(R), M, N]
        mean = jnp.matmul(jnp.swapaxes(Kuf_val, -1, -2), alpha)
        if Kuf_val.ndim == 3:
            mean = jnp.swapaxes(jnp.squeeze(mean, axis=-1), -1, -2)  # [N, L]
        return self._add_mean_function(Xnew, self._mix_mean(mean))


class IndependentPosteriorSingleOutput(IndependentPosterior):
    """reference ``posteriors.py:825-841``."""

    @inherit_check_shapes
    def _conditional_fused(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        Knn = self.kernel(Xnew, full_cov=full_cov)
        Kmm = Kuu(self.X_data, self.kernel, jitter=default_jitter())  # [M, M]
        Kmn = Kuf(self.X_data, self.kernel, Xnew)  # [M, N]
        fmean, fvar = base_conditional(
            Kmn, Kmm, Knn, self.q_mu, full_cov=full_cov, q_sqrt=self.q_sqrt, white=self.whiten
        )
        return self._post_process_mean_and_cov(fmean, fvar, full_cov, full_output_cov)


class IndependentPosteriorMultiOutput(IndependentPosterior):
    """reference ``posteriors.py:844-887``."""

    @inherit_check_shapes
    def _conditional_fused(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        if isinstance(self.X_data, SharedIndependentInducingVariables) and isinstance(
            self.kernel, kernels.SharedIndependent
        ):
            Knn = self.kernel.kernel(Xnew, full_cov=full_cov)
            Kmm = Kuu(self.X_data, self.kernel, jitter=default_jitter())  # [M, M]
            Kmn = Kuf(self.X_data, self.kernel, Xnew)  # [M, N]
            fmean, fvar = base_conditional(
                Kmn, Kmm, Knn, self.q_mu, full_cov=full_cov, q_sqrt=self.q_sqrt, white=self.whiten
            )
        else:
            Kmms = Kuu(self.X_data, self.kernel, jitter=default_jitter())  # [P, M, M]
            Kmns = Kuf(self.X_data, self.kernel, Xnew)  # [P, M, N]
            if isinstance(self.kernel, kernels.Combination):
                kernel_list = self.kernel.kernels
            else:
                kernel_list = [self.kernel.kernel] * len(self.X_data.inducing_variable_list)
            Knns = jnp.stack(
                [k.K(Xnew) if full_cov else k.K_diag(Xnew) for k in kernel_list], axis=0
            )
            fmean, fvar = separate_independent_conditional_implementation(
                Kmns, Kmms, Knns, self.q_mu,
                q_sqrt=self.q_sqrt, full_cov=full_cov, white=self.whiten,
            )
            if full_cov:
                # separate_independent_conditional_implementation returns
                # [P, batch..., N, N]; the fused contract (and the shared/shared
                # base_conditional branch above) are batch-leading.
                fvar = jnp.moveaxis(fvar, 0, -3)
        return self._post_process_mean_and_cov(fmean, fvar, full_cov, full_output_cov)


class LinearCoregionalizationPosterior(IndependentPosteriorMultiOutput):
    """Conditions in g-space then mixes with W (reference ``posteriors.py:890-906``)."""

    def _mix_mean(self, mean: jax.Array) -> jax.Array:
        # g-space latent means [..., N, L] -> output means [..., N, P]
        return jnp.matmul(mean, jnp.swapaxes(self.kernel.W.value, -1, -2))

    @check_shapes(
        "mean: [batch..., N, L]",
        "cov: [batch..., L, N, N] if full_cov",
        "cov: [batch..., N, L] if not full_cov",
        "return[0]: [batch..., N, P]",
        "return[1]: [batch..., N, P, N, P] if full_cov and full_output_cov",
        "return[1]: [batch..., N, P, P] if (not full_cov) and full_output_cov",
        "return[1]: [batch..., P, N, N] if full_cov and (not full_output_cov)",
        "return[1]: [batch..., N, P] if (not full_cov) and (not full_output_cov)",
    )
    def _post_process_mean_and_cov(
        self, mean: jax.Array, cov: jax.Array, full_cov: bool, full_output_cov: bool
    ) -> MeanAndVariance:
        cov = expand_independent_outputs(cov, full_cov, full_output_cov=False)
        if full_cov:
            # mix_latent_gp wants the latent axis leading: [L, batch..., N, N].
            cov = jnp.moveaxis(cov, -3, 0)
        mean, cov = mix_latent_gp(self.kernel.W.value, mean, cov, full_cov, full_output_cov)
        return mean, cov


class FullyCorrelatedPosterior(BasePosterior):
    """reference ``posteriors.py:909-1012``."""

    @inherit_check_shapes
    def _conditional_with_precompute(
        self,
        cache: Tuple[jax.Array, ...],
        Xnew: TensorType,
        full_cov: bool = False,
        full_output_cov: bool = False,
    ) -> MeanAndVariance:
        alpha, Qinv = cache

        Kuf_val = Kuf(self.X_data, self.kernel, Xnew)
        assert Kuf_val.ndim == 4
        M, L, N, K = Kuf_val.shape
        Kuf_val = jnp.reshape(Kuf_val, (M * L, N * K))

        kernel = self.kernel
        Kff = kernel(Xnew, full_cov=full_cov, full_output_cov=full_output_cov)
        if full_cov == full_output_cov:
            new_shape = (N * K, N * K) if full_cov else (N * K,)
            Kff = jnp.reshape(Kff, new_shape)

        mean = jnp.matmul(Kuf_val.T, alpha)  # [NK, R]

        if not full_cov and not full_output_cov:
            Kfu_Qinv_Kuf = jnp.sum(Kuf_val * jnp.matmul(Qinv, Kuf_val), axis=-2)
            cov = Kff - Kfu_Qinv_Kuf
            cov = jnp.swapaxes(cov, -1, -2) if cov.ndim > 1 else cov
        else:
            Kfu_Qinv_Kuf = jnp.matmul(Kuf_val.T, jnp.matmul(Qinv, Kuf_val))
            if not (full_cov and full_output_cov):
                new_shape = Kfu_Qinv_Kuf.shape[:-2] + (N, K, N, K)
                Kfu_Qinv_Kuf = jnp.reshape(Kfu_Qinv_Kuf, new_shape)
                if full_cov:
                    # diagonal in outputs
                    tmp = jnp.diagonal(
                        jnp.einsum("...ijkl->...ikjl", Kfu_Qinv_Kuf), axis1=-2, axis2=-1
                    )
                else:
                    # diagonal in inputs
                    tmp = jnp.diagonal(
                        jnp.einsum("...ijkl->...jlik", Kfu_Qinv_Kuf), axis1=-2, axis2=-1
                    )
                Kfu_Qinv_Kuf = jnp.einsum("...ijk->...kij", tmp)
            cov = Kff - Kfu_Qinv_Kuf

        mean = jnp.reshape(mean, (N, K))
        if full_cov == full_output_cov:
            cov_shape = (N, K, N, K) if full_cov else (N, K)
        else:
            cov_shape = (K, N, N) if full_cov else (N, K, K)
        cov = jnp.reshape(cov, cov_shape)

        return mean, cov

    @inherit_check_shapes
    def _conditional_fused(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        Kmm = Kuu(self.X_data, self.kernel, jitter=default_jitter())  # [M, L, M, L]
        Kmn = Kuf(self.X_data, self.kernel, Xnew)  # [M, L, N, P]
        Knn = self.kernel(Xnew, full_cov=full_cov, full_output_cov=full_output_cov)

        M, L, N, K = Kmn.shape
        Kmm = jnp.reshape(Kmm, (M * L, M * L))

        if full_cov == full_output_cov:
            Kmn = jnp.reshape(Kmn, (M * L, N * K))
            Knn = jnp.reshape(Knn, (N * K, N * K)) if full_cov else jnp.reshape(Knn, (N * K,))
            mean, cov = base_conditional(
                Kmn, Kmm, Knn, self.q_mu, full_cov=full_cov, q_sqrt=self.q_sqrt, white=self.whiten
            )
            mean = jnp.reshape(mean, (N, K))
            cov = jnp.reshape(cov, (N, K, N, K) if full_cov else (N, K))
        else:
            Kmn = jnp.reshape(Kmn, (M * L, N, K))
            mean, cov = fully_correlated_conditional(
                Kmn, Kmm, Knn, self.q_mu,
                full_cov=full_cov, full_output_cov=full_output_cov,
                q_sqrt=self.q_sqrt, white=self.whiten,
            )
        return mean, cov


class FallbackIndependentLatentPosterior(FullyCorrelatedPosterior):
    """reference ``posteriors.py:1015-1036``.

    TPU extension: the precomputed cache works for any number of latent GPs.
    The prior and q(u) are both block-diagonal across latents (Kuu is
    [L, M, M], q_sqrt is per-latent), so ``BasePosterior._precompute``'s
    batched path yields per-latent (alpha [L, M, 1], Qinv [L, M, M]) and the
    cached conditional sums per-latent quadratic forms through the
    interdomain Kuf [M, L, N, P]. The reference's cache inherits the
    flattened [MP, MP] FullyCorrelatedPosterior algebra and only works for
    L=1 (its posterior tests use a single latent,
    ``tests/gpflow/posteriors/test_posteriors.py:446-448``).
    """

    @inherit_check_shapes
    def _conditional_with_precompute(
        self,
        cache: Tuple[jax.Array, ...],
        Xnew: TensorType,
        full_cov: bool = False,
        full_output_cov: bool = False,
    ) -> MeanAndVariance:
        alpha, Qinv = cache  # alpha: [L, M, 1], Qinv: [L, M, M]

        Kuf_val = Kuf(self.X_data, self.kernel, Xnew)  # [M, L, N, P]
        assert Kuf_val.ndim == 4
        Kff = self.kernel(Xnew, full_cov=full_cov, full_output_cov=full_output_cov)

        mean = jnp.einsum("mlnp,lm->np", Kuf_val, alpha[..., 0])
        # T1[l, o, n, p] = sum_m Qinv[l, m, o] Kuf[m, l, n, p]
        proj = jnp.einsum("lmo,mlnp->lonp", Qinv, Kuf_val)
        if full_cov and full_output_cov:
            cov = Kff - jnp.einsum("lonp,olqr->npqr", proj, Kuf_val)  # [N, P, N, P]
        elif full_cov:
            cov = Kff - jnp.einsum("lonp,olqp->pnq", proj, Kuf_val)  # [P, N, N]
        elif full_output_cov:
            cov = Kff - jnp.einsum("lonp,olnr->npr", proj, Kuf_val)  # [N, P, P]
        else:
            cov = Kff - jnp.einsum("lonp,olnp->np", proj, Kuf_val)  # [N, P]
        return mean, cov

    @inherit_check_shapes
    def _conditional_fused(
        self, Xnew: TensorType, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        Kmm = Kuu(self.X_data, self.kernel, jitter=default_jitter())  # [L, M, M]
        Kmn = Kuf(self.X_data, self.kernel, Xnew)  # [M, L, N, P]
        Knn = self.kernel(Xnew, full_cov=full_cov, full_output_cov=full_output_cov)
        return independent_interdomain_conditional(
            Kmn, Kmm, Knn, self.q_mu,
            full_cov=full_cov, full_output_cov=full_output_cov,
            q_sqrt=self.q_sqrt, white=self.whiten,
        )


get_posterior_class = Dispatcher("get_posterior_class")


@get_posterior_class.register(kernels.Kernel, InducingVariables)
def _get_posterior_base_case(
    kernel: Kernel, inducing_variable: InducingVariables
) -> Type[BasePosterior]:
    return IndependentPosteriorSingleOutput


@get_posterior_class.register(kernels.MultioutputKernel, InducingPoints)
def _get_posterior_fully_correlated_mo(
    kernel: Kernel, inducing_variable: InducingVariables
) -> Type[BasePosterior]:
    return FullyCorrelatedPosterior


def _get_posterior_independent_mo(
    kernel: Kernel, inducing_variable: InducingVariables
) -> Type[BasePosterior]:
    return IndependentPosteriorMultiOutput


for _k in (kernels.SharedIndependent, kernels.SeparateIndependent):
    for _iv in (SeparateIndependentInducingVariables, SharedIndependentInducingVariables):
        get_posterior_class.add((_k, _iv), _get_posterior_independent_mo)


def _get_posterior_independentlatent_mo_fallback(
    kernel: Kernel, inducing_variable: InducingVariables
) -> Type[BasePosterior]:
    return FallbackIndependentLatentPosterior


for _iv in (
    FallbackSeparateIndependentInducingVariables,
    FallbackSharedIndependentInducingVariables,
):
    get_posterior_class.add((kernels.IndependentLatent, _iv), _get_posterior_independentlatent_mo_fallback)


def _get_posterior_linearcoregionalization_mo_efficient(
    kernel: Kernel, inducing_variable: InducingVariables
) -> Type[BasePosterior]:
    return LinearCoregionalizationPosterior


for _iv in (SeparateIndependentInducingVariables, SharedIndependentInducingVariables):
    get_posterior_class.add(
        (kernels.LinearCoregionalization, _iv), _get_posterior_linearcoregionalization_mo_efficient
    )


def create_posterior(
    kernel: Kernel,
    inducing_variable: InducingVariables,
    q_mu: TensorType,
    q_sqrt: TensorType,
    whiten: bool,
    mean_function: Optional[MeanFunction] = None,
    precompute_cache: Union[PrecomputeCacheType, str, None] = PrecomputeCacheType.TENSOR,
) -> BasePosterior:
    """Factory selecting the posterior class from (kernel, inducing variable)
    types (reference ``posteriors.py:1089-1108``; selection matrix SURVEY.md A.1)."""
    posterior_class = get_posterior_class(kernel, inducing_variable)
    precompute_cache = _validate_precompute_cache_type(precompute_cache)
    return posterior_class(
        kernel,
        inducing_variable,
        q_mu,
        q_sqrt,
        whiten,
        mean_function,
        precompute_cache=precompute_cache,
    )
