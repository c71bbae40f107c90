"""Sparse GP regression: SGPR (Titsias 2009) and GPRFITC (Snelson & Ghahramani
2006) (reference ``/root/reference/gpflow/models/sgpr.py``).

TPU note: the hot path is one [M, N] triangular solve + [M, M] matmuls per
objective evaluation — all MXU work under jit; formulas follow SURVEY.md A.2.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from .. import posteriors
from ..base import InputData, MeanAndVariance, RegressionData, TensorData
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..config import default_float, default_jitter
from ..covariances import Kuf, Kuu
from ..functions import MeanFunction
from ..kernels import Kernel
from ..likelihoods import Gaussian
from ..utilities import add_noise_cov, assert_params_false, to_default_float
from .model import GPModel
from .training_mixins import InternalDataTrainingLossMixin
from .util import data_input_to_tensor, inducingpoint_wrapper

__all__ = ["GPRFITC", "SGPR", "SGPRBase_deprecated", "SGPR_deprecated", "SGPR_with_posterior"]


class SGPRBase_deprecated(GPModel, InternalDataTrainingLossMixin):
    """Common base for SGPR and GPRFITC: __init__ + Titsias-2014 upper bound
    (reference ``sgpr.py:35-147``)."""

    @check_shapes(
        "data[0]: [N, D]",
        "data[1]: [N, P]",
        "noise_variance: []",
    )
    def __init__(
        self,
        data: RegressionData,
        kernel: Kernel,
        inducing_variable,
        *,
        mean_function: Optional[MeanFunction] = None,
        num_latent_gps: Optional[int] = None,
        noise_variance: Optional[TensorData] = None,
        likelihood: Optional[Gaussian] = None,
    ):
        assert (noise_variance is None) or (
            likelihood is None
        ), "Cannot set both `noise_variance` and `likelihood`."
        if likelihood is None:
            if noise_variance is None:
                noise_variance = 1.0
            likelihood = Gaussian(noise_variance)
        X_data, Y_data = data_input_to_tensor(data)
        num_latent_gps = Y_data.shape[-1] if num_latent_gps is None else num_latent_gps
        super().__init__(kernel, likelihood, mean_function, num_latent_gps=num_latent_gps)

        self.data = X_data, Y_data
        self.num_data = X_data.shape[0]
        self.inducing_variable = inducingpoint_wrapper(inducing_variable)

    @check_shapes("return: []")
    def upper_bound(self) -> jax.Array:
        """Titsias-2014 upper bound on the marginal likelihood
        (reference ``sgpr.py:84-147``)."""
        X_data, Y_data = self.data

        sigma_sq = jnp.squeeze(self.likelihood.variance_at(X_data), axis=-1)  # [N]
        sigma = jnp.sqrt(sigma_sq)

        Kdiag = self.kernel(X_data, full_cov=False)
        kuu = Kuu(self.inducing_variable, self.kernel, jitter=default_jitter())
        kuf = Kuf(self.inducing_variable, self.kernel, X_data)

        I = jnp.eye(kuu.shape[0], dtype=default_float())

        L = jnp.linalg.cholesky(kuu)
        A = solve_triangular(L, kuf, lower=True)

        A_sigma = solve_triangular(L, kuf / sigma, lower=True)
        AAT_sigma = A_sigma @ A_sigma.T
        B = I + AAT_sigma
        LB = jnp.linalg.cholesky(B)

        # Trace bound (Titsias' presentation)
        c = jnp.sum(Kdiag) - jnp.sum(jnp.square(A))

        cn_var = sigma_sq + c
        cn_std = jnp.sqrt(cn_var)

        const = -0.5 * jnp.sum(jnp.log(2 * np.pi * sigma_sq))
        logdet = -jnp.sum(jnp.log(jnp.diag(LB)))

        A_cn = solve_triangular(L, kuf / cn_std, lower=True)
        AAT_cn = A_cn @ A_cn.T

        err = Y_data - self.mean_function(X_data)
        LC = jnp.linalg.cholesky(I + AAT_cn)
        v = solve_triangular(LC, A_cn @ (err / cn_std[:, None]), lower=True)
        quad = -0.5 * jnp.sum(jnp.square(err / cn_std[:, None])) + 0.5 * jnp.sum(jnp.square(v))

        return const + logdet + quad


class SGPR_deprecated(SGPRBase_deprecated):
    """Sparse GP regression, collapsed ELBO (Titsias 2009;
    reference ``sgpr.py:150-377``)."""

    class CommonTensors(NamedTuple):
        sigma_sq: jax.Array
        sigma: jax.Array
        A: jax.Array
        B: jax.Array
        LB: jax.Array
        AAT: jax.Array
        L: jax.Array

    @check_shapes("return: []")
    def maximum_log_likelihood_objective(self) -> jax.Array:
        return self.elbo()

    @check_shapes(
        "return.sigma_sq: [N]",
        "return.sigma: [N]",
        "return.A: [M, N]",
        "return.B: [M, M]",
        "return.LB: [M, M]",
        "return.AAT: [M, M]",
        "return.L: [M, M]",
    )
    def _common_calculation(self) -> "SGPR_deprecated.CommonTensors":
        """sigma, A = L^-1 Kuf / sigma, B = AA^T + I, LB
        (reference ``sgpr.py:181-209``)."""
        x, _ = self.data
        iv = self.inducing_variable

        sigma_sq = jnp.squeeze(self.likelihood.variance_at(x), axis=-1)  # [N]
        sigma = jnp.sqrt(sigma_sq)

        kuf = Kuf(iv, self.kernel, x)  # [M, N]
        kuu = Kuu(iv, self.kernel, jitter=default_jitter())  # [M, M]
        L = jnp.linalg.cholesky(kuu)

        A = solve_triangular(L, kuf / sigma, lower=True)
        AAT = A @ A.T
        B = add_noise_cov(AAT, jnp.asarray(1.0, AAT.dtype))
        LB = jnp.linalg.cholesky(B)

        return self.CommonTensors(sigma_sq, sigma, A, B, LB, AAT, L)

    @check_shapes("return: []")
    def logdet_term(self, common: "SGPR_deprecated.CommonTensors") -> jax.Array:
        """Jensen bound on -0.5 outdim log|K + sigma^2 I|
        (reference ``sgpr.py:211-246``)."""
        sigma_sq = common.sigma_sq
        LB = common.LB
        AAT = common.AAT

        x, y = self.data
        outdim = to_default_float(y.shape[1])
        kdiag = self.kernel(x, full_cov=False)

        trace_k = jnp.sum(kdiag / sigma_sq)
        trace_q = jnp.sum(jnp.diag(AAT))
        trace = trace_k - trace_q

        half_logdet_b = jnp.sum(jnp.log(jnp.diag(LB)))
        log_sigma_sq = jnp.sum(jnp.log(sigma_sq))

        logdet_k = -outdim * (half_logdet_b + 0.5 * log_sigma_sq + 0.5 * trace)
        return logdet_k

    @check_shapes("return: []")
    def quad_term(self, common: "SGPR_deprecated.CommonTensors") -> jax.Array:
        """Lower bound on -0.5 y^T (K + sigma^2 I)^-1 y
        (reference ``sgpr.py:248-271``)."""
        sigma = common.sigma
        A = common.A
        LB = common.LB

        x, y = self.data
        err = (y - self.mean_function(x)) / sigma[..., None]

        Aerr = A @ err
        c = solve_triangular(LB, Aerr, lower=True)

        err_inner_prod = jnp.sum(jnp.square(err))
        c_inner_prod = jnp.sum(jnp.square(c))

        return -0.5 * (err_inner_prod - c_inner_prod)

    @check_shapes("return: []")
    def elbo(self) -> jax.Array:
        """Collapsed evidence lower bound (reference ``sgpr.py:273-289``)."""
        common = self._common_calculation()
        num_data = to_default_float(self.data[1].shape[0])
        output_dim = to_default_float(self.data[1].shape[1])
        const = -0.5 * num_data * output_dim * np.log(2 * np.pi)
        logdet = self.logdet_term(common)
        quad = self.quad_term(common)
        return const + logdet + quad

    @inherit_check_shapes
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """reference ``sgpr.py:291-340``."""
        assert_params_false(self.predict_f, full_output_cov=full_output_cov)

        X_data, Y_data = self.data
        num_inducing = self.inducing_variable.num_inducing
        err = Y_data - self.mean_function(X_data)
        kuf = Kuf(self.inducing_variable, self.kernel, X_data)
        kuu = Kuu(self.inducing_variable, self.kernel, jitter=default_jitter())
        Kus = Kuf(self.inducing_variable, self.kernel, Xnew)

        sigma_sq = jnp.squeeze(self.likelihood.variance_at(X_data), axis=-1)
        sigma = jnp.sqrt(sigma_sq)

        L = jnp.linalg.cholesky(kuu)
        A = solve_triangular(L, kuf / sigma, lower=True)
        B = A @ A.T + jnp.eye(num_inducing, dtype=default_float())
        LB = jnp.linalg.cholesky(B)
        Aerr = A @ (err / sigma[..., None])
        c = solve_triangular(LB, Aerr, lower=True)
        tmp1 = solve_triangular(L, Kus, lower=True)
        tmp2 = solve_triangular(LB, tmp1, lower=True)
        mean = tmp2.T @ c
        if full_cov:
            var = self.kernel(Xnew) + tmp2.T @ tmp2 - tmp1.T @ tmp1
            var = jnp.broadcast_to(var[None, ...], (self.num_latent_gps,) + var.shape)
        else:
            var = (
                self.kernel(Xnew, full_cov=False)
                + jnp.sum(jnp.square(tmp2), 0)
                - jnp.sum(jnp.square(tmp1), 0)
            )
            var = jnp.broadcast_to(var[:, None], var.shape + (self.num_latent_gps,))

        return mean + self.mean_function(Xnew), var

    @check_shapes("return[0]: [M, P]", "return[1]: [M, M]")
    def compute_qu(self) -> Tuple[jax.Array, jax.Array]:
        """Mean/cov of the implied q(u); SVGP with this q(u) predicts
        identically to SGPR (reference ``sgpr.py:342-377``)."""
        X_data, Y_data = self.data

        kuf = Kuf(self.inducing_variable, self.kernel, X_data)
        kuu = Kuu(self.inducing_variable, self.kernel, jitter=default_jitter())

        var = jnp.squeeze(self.likelihood.variance_at(X_data), axis=-1)
        std = jnp.sqrt(var)
        scaled_kuf = kuf / std
        sig = kuu + scaled_kuf @ scaled_kuf.T
        sig_sqrt = jnp.linalg.cholesky(sig)

        sig_sqrt_kuu = solve_triangular(sig_sqrt, kuu, lower=True)

        cov = sig_sqrt_kuu.T @ sig_sqrt_kuu
        err = Y_data - self.mean_function(X_data)
        scaled_err = err / std[..., None]
        mu = sig_sqrt_kuu.T @ solve_triangular(sig_sqrt, scaled_kuf @ scaled_err, lower=True)

        return mu, cov


class GPRFITC(SGPRBase_deprecated):
    """GP regression with the FITC approximation
    (reference ``sgpr.py:380-523``)."""

    @check_shapes(
        "return[0]: [N, R]",
        "return[1]: [N]",
        "return[2]: [M, M]",
        "return[3]: [M, M]",
        "return[4]: [M, R]",
        "return[5]: [N, R]",
        "return[6]: [M, R]",
    )
    def common_terms(
        self,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
        """nu = Kdiag - diag(Qff) + sigma^2; Woodbury pieces
        (reference ``sgpr.py:399-426``)."""
        X_data, Y_data = self.data
        num_inducing = self.inducing_variable.num_inducing
        err = Y_data - self.mean_function(X_data)  # [N, R]
        Kdiag = self.kernel(X_data, full_cov=False)
        kuf = Kuf(self.inducing_variable, self.kernel, X_data)
        kuu = Kuu(self.inducing_variable, self.kernel, jitter=default_jitter())

        sigma_sq = jnp.squeeze(self.likelihood.variance_at(X_data), axis=-1)

        Luu = jnp.linalg.cholesky(kuu)
        V = solve_triangular(Luu, kuf, lower=True)  # V^T V = Qff

        diagQff = jnp.sum(jnp.square(V), 0)
        nu = Kdiag - diagQff + sigma_sq

        B = jnp.eye(num_inducing, dtype=default_float()) + (V / nu) @ V.T
        L = jnp.linalg.cholesky(B)
        beta = err / nu[:, None]  # [N, R]
        alpha = V @ beta  # [M, R]

        gamma = solve_triangular(L, alpha, lower=True)  # [M, R]

        return err, nu, Luu, L, alpha, beta, gamma

    @check_shapes("return: []")
    def maximum_log_likelihood_objective(self) -> jax.Array:
        return self.fitc_log_marginal_likelihood()

    @check_shapes("return: []")
    def fitc_log_marginal_likelihood(self) -> jax.Array:
        """FITC approximation via Woodbury + determinant lemma
        (reference ``sgpr.py:428-487``)."""
        err, nu, _Luu, L, _alpha, _beta, gamma = self.common_terms()

        mahalanobisTerm = -0.5 * jnp.sum(jnp.square(err) / nu[:, None]) + 0.5 * jnp.sum(
            jnp.square(gamma)
        )

        constantTerm = -0.5 * self.num_data * jnp.log(
            jnp.asarray(2.0 * np.pi, default_float())
        )
        logDeterminantTerm = -0.5 * jnp.sum(jnp.log(nu)) - jnp.sum(jnp.log(jnp.diag(L)))
        logNormalizingTerm = constantTerm + logDeterminantTerm

        return mahalanobisTerm + logNormalizingTerm * self.num_latent_gps

    @inherit_check_shapes
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """reference ``sgpr.py:489-523``."""
        assert_params_false(self.predict_f, full_output_cov=full_output_cov)

        _, _, Luu, L, _, _, gamma = self.common_terms()
        Kus = Kuf(self.inducing_variable, self.kernel, Xnew)  # [M, N]

        w = solve_triangular(Luu, Kus, lower=True)  # [M, N]

        tmp = solve_triangular(L.T, gamma, lower=False)
        mean = w.T @ tmp + self.mean_function(Xnew)
        intermediateA = solve_triangular(L, w, lower=True)

        if full_cov:
            var = self.kernel(Xnew) - w.T @ w + intermediateA.T @ intermediateA
            var = jnp.broadcast_to(var[None, ...], (self.num_latent_gps,) + var.shape)
        else:
            var = (
                self.kernel(Xnew, full_cov=False)
                - jnp.sum(jnp.square(w), 0)
                + jnp.sum(jnp.square(intermediateA), 0)
            )
            var = jnp.broadcast_to(var[:, None], var.shape + (self.num_latent_gps,))

        return mean, var


class SGPR_with_posterior(SGPR_deprecated):
    """Adds cached-posterior prediction (reference ``sgpr.py:526-587``)."""

    def posterior(
        self,
        precompute_cache: posteriors.PrecomputeCacheType = posteriors.PrecomputeCacheType.TENSOR,
    ) -> posteriors.SGPRPosterior:
        return posteriors.SGPRPosterior(
            kernel=self.kernel,
            data=self.data,
            inducing_variable=self.inducing_variable,
            likelihood=self.likelihood,
            num_latent_gps=self.num_latent_gps,
            mean_function=self.mean_function,
            precompute_cache=precompute_cache,
        )

    @inherit_check_shapes
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        return self.posterior(posteriors.PrecomputeCacheType.NOCACHE).fused_predict_f(
            Xnew, full_cov=full_cov, full_output_cov=full_output_cov
        )


class SGPR(SGPR_with_posterior):
    """Sparse GP regression (Titsias 2009)."""
