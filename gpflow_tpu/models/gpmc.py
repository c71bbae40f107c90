"""GPMC: full MCMC over whitened function values (reference
``/root/reference/gpflow/models/gpmc.py:34-128``)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import InputData, MeanAndVariance, Parameter, RegressionData
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..conditionals import conditional
from ..config import default_float, default_jitter
from ..functions import MeanFunction
from ..kernels import Kernel
from ..likelihoods import Likelihood
from ..priors import Normal
from ..utilities import assert_params_false
from .model import GPModel
from .training_mixins import InternalDataTrainingLossMixin
from .util import data_input_to_tensor

__all__ = ["GPMC"]


class GPMC(GPModel, InternalDataTrainingLossMixin):
    """Vanilla GP with a non-Gaussian likelihood for MCMC: the latent values
    are whitened, v ~ N(0, I), f = L v + m(x) with L L^T = K."""

    @check_shapes(
        "data[0]: [N, D]",
        "data[1]: [N, P]",
    )
    def __init__(
        self,
        data: RegressionData,
        kernel: Kernel,
        likelihood: Likelihood,
        mean_function: Optional[MeanFunction] = None,
        num_latent_gps: Optional[int] = None,
    ):
        if num_latent_gps is None:
            num_latent_gps = self.calc_num_latent_gps_from_data(data, kernel, likelihood)
        super().__init__(kernel, likelihood, mean_function, num_latent_gps)
        self.data = data_input_to_tensor(data)
        self.num_data = self.data[0].shape[0]
        self.V = Parameter(np.zeros((self.num_data, self.num_latent_gps)), name="V")
        self.V.prior = Normal(0.0, 1.0)

    @check_shapes("return: []")
    def log_posterior_density(self) -> jax.Array:
        return self.log_likelihood() + self.log_prior_density()

    @check_shapes("return: []")
    def _training_loss(self) -> jax.Array:
        return -self.log_posterior_density()

    @check_shapes("return: []")
    def maximum_log_likelihood_objective(self) -> jax.Array:
        return self.log_likelihood()

    @check_shapes("return: []")
    def log_likelihood(self) -> jax.Array:
        """log p(Y | V, theta) (reference ``gpmc.py:91-106``)."""
        X_data, Y_data = self.data
        K = self.kernel(X_data)
        L = jnp.linalg.cholesky(
            K + jnp.eye(X_data.shape[0], dtype=default_float()) * default_jitter()
        )
        F = L @ self.V.value + self.mean_function(X_data)
        return jnp.sum(self.likelihood.log_prob(X_data, F, Y_data))

    @inherit_check_shapes
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """p(F* | F = L V) (reference ``gpmc.py:108-128``)."""
        assert_params_false(self.predict_f, full_output_cov=full_output_cov)
        X_data, _Y_data = self.data
        mu, var = conditional(
            Xnew, X_data, self.kernel, self.V.value, full_cov=full_cov, q_sqrt=None, white=True
        )
        return mu + self.mean_function(Xnew), var
