"""Exact GP regression (reference ``/root/reference/gpflow/models/gpr.py``).

Keeps the reference's three-layer class pattern (``gpr.py:34,140,193``):
``GPR_deprecated`` (fused prediction) -> ``GPR_with_posterior`` (cached
posterior) -> ``GPR``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import posteriors
from ..base import InputData, MeanAndVariance, RegressionData, TensorData
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..conditionals.util import base_conditional
from ..functions import MeanFunction
from ..kernels import Kernel
from ..likelihoods import Gaussian
from ..logdensities import multivariate_normal
from ..utilities import add_likelihood_noise_cov
from ..utilities.model_utils import assert_params_false
from .model import GPModel
from .training_mixins import InternalDataTrainingLossMixin
from .util import data_input_to_tensor

__all__ = ["GPR", "GPR_deprecated", "GPR_with_posterior"]


class GPR_deprecated(GPModel, InternalDataTrainingLossMixin):
    """GPR with fused (non-cached) prediction (reference ``gpr.py:34-137``)."""

    @check_shapes(
        "data[0]: [N, D]",
        "data[1]: [N, P]",
        "noise_variance: []",
    )
    def __init__(
        self,
        data: RegressionData,
        kernel: Kernel,
        mean_function: Optional[MeanFunction] = None,
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
        _, Y_data = data
        super().__init__(
            kernel,
            likelihood,
            mean_function,
            num_latent_gps=Y_data.shape[-1],
        )
        self.data = data_input_to_tensor(data)

    @check_shapes("return: []")
    def maximum_log_likelihood_objective(self) -> jax.Array:
        return self.log_marginal_likelihood()

    @check_shapes("return: []")
    def log_marginal_likelihood(self) -> jax.Array:
        """log p(Y | theta) via Cholesky of K + sigma^2 I
        (reference ``gpr.py:91-107``) — the O(N^3) hot path.

        Under ``GPFLOW_TPU_INV_SOLVE`` the density takes the ANALYTIC
        pullback (``ops.linalg.mvn_logp``: dK = 1/2 beta beta^T - 1/2 K^-1,
        one matmul + a blocked triangular inverse): differentiating through
        the factorization instead — XLA's stock Cholesky VJP or the generic
        matmul pullback — measured 6-12x the forward at N=8k-16k, and THAT
        is the actual hot path of L-BFGS training (SURVEY §3.2)."""
        X, Y = self.data
        K = self.kernel(X)
        ks = add_likelihood_noise_cov(K, self.likelihood, X)
        from ..conditionals.util import _use_inv_solve

        m = self.mean_function(X)
        if _use_inv_solve():
            from ..ops.linalg import mvn_logp

            return jnp.sum(mvn_logp(ks, Y - m))
        L = jnp.linalg.cholesky(ks)
        # [R,] log-likelihoods for each independent dimension of Y
        # (multivariate_normal treats rows as the event dim, columns as R)
        log_prob = multivariate_normal(Y, m, L)
        return jnp.sum(log_prob)

    @inherit_check_shapes
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """Posterior mean/cov of f at Xnew (reference ``gpr.py:109-137``)."""
        assert_params_false(self.predict_f, full_output_cov=full_output_cov)

        X, Y = self.data
        err = Y - self.mean_function(X)

        kmm = self.kernel(X)
        knn = self.kernel(Xnew, full_cov=full_cov)
        kmn = self.kernel(X, Xnew)
        kmm_plus_s = add_likelihood_noise_cov(kmm, self.likelihood, X)

        conditional = base_conditional
        f_mean_zero, f_var = conditional(
            kmn, kmm_plus_s, knn, err, full_cov=full_cov, white=False
        )
        f_mean = f_mean_zero + self.mean_function(Xnew)
        return f_mean, f_var


class GPR_with_posterior(GPR_deprecated):
    """Adds cached-posterior prediction (reference ``gpr.py:140-190``)."""

    def posterior(
        self,
        precompute_cache: posteriors.PrecomputeCacheType = posteriors.PrecomputeCacheType.TENSOR,
    ) -> posteriors.GPRPosterior:
        """Creates a posterior with precomputed (err, Lm) for fast repeated
        prediction."""
        return posteriors.GPRPosterior(
            kernel=self.kernel,
            data=self.data,
            likelihood=self.likelihood,
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


class GPR(GPR_with_posterior):
    """Exact Gaussian-process regression with a Gaussian likelihood
    (reference ``gpr.py:193-196``)."""
