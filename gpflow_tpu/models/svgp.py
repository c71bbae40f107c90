"""Sparse Variational GP (Hensman et al. 2013/2014)
(reference ``/root/reference/gpflow/models/svgp.py``).

This is the scalability flagship (SURVEY.md §3.3): the per-minibatch ELBO is
one [M, M] Cholesky + [M, B] solves, minibatch-ready via
ExternalDataTrainingLossMixin; the sharded multi-chip training step lives in
``gpflow_tpu.parallel``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import kullback_leiblers, posteriors
from ..base import InputData, MeanAndVariance, Parameter, RegressionData
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..bijectors import positive, triangular
from ..conditionals import conditional
from ..config import default_float
from ..functions import MeanFunction
from ..kernels import Kernel
from ..likelihoods import Likelihood
from .model import GPModel
from .training_mixins import ExternalDataTrainingLossMixin
from .util import inducingpoint_wrapper

__all__ = ["SVGP", "SVGP_deprecated", "SVGP_with_posterior"]


class SVGP_deprecated(GPModel, ExternalDataTrainingLossMixin):
    """SVGP with uncollapsed ELBO (reference ``svgp.py:35-199``)."""

    @check_shapes(
        "q_mu: [M, P]",
        "q_sqrt: [M, P] if q_diag",
        "q_sqrt: [P, M, M] if (not q_diag)",
    )
    def __init__(
        self,
        kernel: Kernel,
        likelihood: Likelihood,
        inducing_variable,
        *,
        mean_function: Optional[MeanFunction] = None,
        num_latent_gps: int = 1,
        q_diag: bool = False,
        q_mu=None,
        q_sqrt=None,
        whiten: bool = True,
        num_data=None,
    ):
        """num_data is the total dataset size N for minibatch ELBO scaling
        (reference ``svgp.py:60-84``)."""
        super().__init__(kernel, likelihood, mean_function, num_latent_gps)
        self.num_data = num_data
        self.whiten = whiten
        self.inducing_variable = inducingpoint_wrapper(inducing_variable)

        num_inducing = self.inducing_variable.num_inducing
        self._init_variational_parameters(num_inducing, q_mu, q_sqrt, q_diag)

    @check_shapes(
        "q_mu: [M, P]",
        "q_sqrt: [M, P] if q_diag",
        "q_sqrt: [P, M, M] if (not q_diag)",
    )
    def _init_variational_parameters(
        self, num_inducing: int, q_mu, q_sqrt, q_diag: bool
    ) -> None:
        """q_mu [M, P]; q_sqrt [M, P] (diag) or [P, M, M] (tril)
        (reference ``svgp.py:85-148``)."""
        q_mu = np.zeros((num_inducing, self.num_latent_gps)) if q_mu is None else q_mu
        self.q_mu = Parameter(q_mu, dtype=default_float(), name="q_mu")  # [M, P]

        if q_sqrt is None:
            if q_diag:
                ones = np.ones((num_inducing, self.num_latent_gps), dtype=default_float())
                self.q_sqrt = Parameter(ones, transform=positive(), name="q_sqrt")  # [M, P]
            else:
                np_q_sqrt = np.array(
                    [np.eye(num_inducing, dtype=default_float()) for _ in range(self.num_latent_gps)]
                )
                self.q_sqrt = Parameter(np_q_sqrt, transform=triangular(), name="q_sqrt")  # [P, M, M]
        else:
            q_sqrt = np.asarray(q_sqrt)
            if q_diag:
                assert q_sqrt.ndim == 2
                self.num_latent_gps = q_sqrt.shape[1]
                self.q_sqrt = Parameter(q_sqrt, transform=positive(), name="q_sqrt")  # [M, L|P]
            else:
                assert q_sqrt.ndim == 3
                self.num_latent_gps = q_sqrt.shape[0]
                self.q_sqrt = Parameter(q_sqrt, transform=triangular(), name="q_sqrt")  # [L|P, M, M]

    @check_shapes("return: []")
    def prior_kl(self) -> jax.Array:
        return kullback_leiblers.prior_kl(
            self.inducing_variable, self.kernel, self.q_mu.value, self.q_sqrt.value,
            whiten=self.whiten,
        )

    @check_shapes("return: []")
    def maximum_log_likelihood_objective(self, data: RegressionData) -> jax.Array:
        return self.elbo(data)

    @check_shapes("return: []")
    def elbo(self, data: RegressionData) -> jax.Array:
        """ELBO = scale * sum(var_exp) - KL (reference ``svgp.py:150-181``)."""
        X, Y = data
        kl = self.prior_kl()
        f_mean, f_var = self.predict_f(X, full_cov=False, full_output_cov=False)
        var_exp = self.likelihood.variational_expectations(X, f_mean, f_var, Y)
        if self.num_data is not None:
            num_data = jnp.asarray(self.num_data, dtype=kl.dtype)
            minibatch_size = jnp.asarray(jnp.shape(X)[0], dtype=kl.dtype)
            scale = num_data / minibatch_size
        else:
            scale = jnp.asarray(1.0, dtype=kl.dtype)
        return jnp.sum(var_exp) * scale - kl

    @inherit_check_shapes
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        mu, var = conditional(
            Xnew,
            self.inducing_variable,
            self.kernel,
            self.q_mu.value,
            q_sqrt=self.q_sqrt.value,
            full_cov=full_cov,
            white=self.whiten,
            full_output_cov=full_output_cov,
        )
        return mu + self.mean_function(Xnew), var


class SVGP_with_posterior(SVGP_deprecated):
    """Adds cached-posterior prediction (reference ``svgp.py:202-255``)."""

    def posterior(
        self,
        precompute_cache: posteriors.PrecomputeCacheType = posteriors.PrecomputeCacheType.TENSOR,
    ) -> posteriors.BasePosterior:
        return posteriors.create_posterior(
            self.kernel,
            self.inducing_variable,
            self.q_mu,
            self.q_sqrt,
            whiten=self.whiten,
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


class SVGP(SVGP_with_posterior):
    """Sparse Variational Gaussian Process (Hensman et al. 2014)."""
