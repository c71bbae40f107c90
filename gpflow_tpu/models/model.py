"""Model base classes (reference ``/root/reference/gpflow/models/model.py``)."""
from __future__ import annotations

import abc
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..base import InputData, MeanAndVariance, Module, RegressionData
from ..conditionals.util import sample_mvn
from ..config import default_float
from ..functions import MeanFunction, Zero
from ..kernels import Kernel, MultioutputKernel
from ..likelihoods import Likelihood, SwitchedLikelihood
from ..utilities import assert_params_false
from ..utilities.shapes import check_shapes

__all__ = ["BayesianModel", "GPModel"]


class BayesianModel(Module, abc.ABC):
    """Base for all models: prior/posterior densities and the ML objective
    (reference ``model.py:30-89``)."""

    @check_shapes("return: []")
    def log_prior_density(self) -> jax.Array:
        """Sum of log prior densities of all trainable parameters
        (reference ``model.py:44-54``)."""
        params = self.trainable_parameters
        if params:
            return sum(p.log_prior_density() for p in params)
        return jnp.zeros((), dtype=default_float())

    @check_shapes("return: []")
    def log_posterior_density(self, *args: Any, **kwargs: Any) -> jax.Array:
        return self.maximum_log_likelihood_objective(*args, **kwargs) + self.log_prior_density()

    @check_shapes("return: []")
    def _training_loss(self, *args: Any, **kwargs: Any) -> jax.Array:
        """-(MLL + log prior); allows MAP estimation (reference ``model.py:71-76``)."""
        return -(
            self.maximum_log_likelihood_objective(*args, **kwargs) + self.log_prior_density()
        )

    @abc.abstractmethod
    @check_shapes("return: []")
    def maximum_log_likelihood_objective(self, *args: Any, **kwargs: Any) -> jax.Array:
        raise NotImplementedError


class GPModel(BayesianModel):
    """Base for GP models f ~ GP(m, k), y_i | f_i ~ p(y_i | f_i)
    (reference ``model.py:92-343``). Subclasses define predict_f; predict_y /
    predict_log_density push predictions through the likelihood."""

    def __init__(
        self,
        kernel: Kernel,
        likelihood: Likelihood,
        mean_function: Optional[MeanFunction] = None,
        num_latent_gps: Optional[int] = None,
    ):
        assert num_latent_gps is not None, "GPModel requires specification of num_latent_gps"
        self.num_latent_gps = num_latent_gps
        if mean_function is None:
            mean_function = Zero()
        self.mean_function = mean_function
        self.kernel = kernel
        self.likelihood = likelihood

    @staticmethod
    @check_shapes(
        "data[0]: [batch..., N, D]",
        "data[1]: [batch..., N, P]",
    )
    def calc_num_latent_gps_from_data(
        data: RegressionData, kernel: Kernel, likelihood: Likelihood
    ) -> int:
        _, Y = data
        output_dim = jnp.shape(Y)[-1]
        return GPModel.calc_num_latent_gps(kernel, likelihood, output_dim)

    @staticmethod
    def calc_num_latent_gps(kernel: Kernel, likelihood: Likelihood, output_dim: int) -> int:
        """MultioutputKernel -> kernel.num_latent_gps; SwitchedLikelihood ->
        P-1 (last column is the index); else P (reference ``model.py:159-185``)."""
        if isinstance(kernel, MultioutputKernel):
            num_latent_gps: int = kernel.num_latent_gps
        elif isinstance(likelihood, SwitchedLikelihood):
            num_latent_gps = output_dim - 1
            assert num_latent_gps > 0
        else:
            num_latent_gps = output_dim
        return num_latent_gps

    @abc.abstractmethod
    @check_shapes(
        "Xnew: [batch..., N, D]",
        "return[0]: [batch..., N, P]",
        "return[1]: [batch..., N, P] if (not full_cov) and (not full_output_cov)",
        "return[1]: [batch..., P, N, N] if full_cov and (not full_output_cov)",
        "return[1]: [batch..., N, P, P] if (not full_cov) and full_output_cov",
        "return[1]: [batch..., N, P, N, P] if full_cov and full_output_cov",
    )
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        raise NotImplementedError

    @check_shapes(
        "Xnew: [batch..., N, D]",
        "return: [batch..., S, N, P] if num_samples is not None",
        "return: [batch..., N, P] if num_samples is None",
    )
    def predict_f_samples(
        self,
        Xnew: InputData,
        num_samples: Optional[int] = None,
        full_cov: bool = True,
        full_output_cov: bool = False,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Samples from the posterior latent functions
        (reference ``model.py:227-280``); takes an optional PRNG ``key``."""
        if full_cov and full_output_cov:
            raise NotImplementedError(
                "The combination of both `full_cov` and `full_output_cov` is not supported."
            )
        mean, cov = self.predict_f(Xnew, full_cov=full_cov, full_output_cov=full_output_cov)
        if full_cov:
            mean_for_sample = jnp.swapaxes(mean, -1, -2)  # [..., P, N]
            samples = sample_mvn(mean_for_sample, cov, full_cov, num_samples=num_samples, key=key)
            samples = jnp.swapaxes(samples, -1, -2)
        else:
            samples = sample_mvn(mean, cov, full_output_cov, num_samples=num_samples, key=key)
        return samples

    @check_shapes(
        "Xnew: [batch..., N, D]",
        "return[0]: [batch..., N, P]",
        "return[1]: [batch..., N, P]",
    )
    def predict_y(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """Mean/variance of held-out data (reference ``model.py:282-325``)."""
        assert_params_false(self.predict_y, full_cov=full_cov, full_output_cov=full_output_cov)
        f_mean, f_var = self.predict_f(Xnew, full_cov=full_cov, full_output_cov=full_output_cov)
        return self.likelihood.predict_mean_and_var(Xnew, f_mean, f_var)

    @check_shapes(
        "return: [batch..., N]",
    )
    def predict_log_density(
        self, data: RegressionData, full_cov: bool = False, full_output_cov: bool = False
    ) -> jax.Array:
        """Log density of data at new points (reference ``model.py:327-343``)."""
        assert_params_false(
            self.predict_log_density, full_cov=full_cov, full_output_cov=full_output_cov
        )
        X, Y = data
        f_mean, f_var = self.predict_f(X, full_cov=full_cov, full_output_cov=full_output_cov)
        return self.likelihood.predict_log_density(X, f_mean, f_var, Y)
