"""GPLVM and Bayesian GPLVM (reference ``/root/reference/gpflow/models/gplvm.py``)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from .. import kernels as kernels_module
from ..base import InputData, MeanAndVariance, OutputData, Parameter, RegressionData, TensorType
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..bijectors import positive
from ..config import default_float, default_jitter
from ..covariances import Kuf, Kuu
from ..expectations import expectation
from ..functions import MeanFunction, Zero
from ..inducing_variables import InducingPoints
from ..kernels import Kernel
from ..likelihoods import Gaussian
from ..probability_distributions import DiagonalGaussian
from ..utilities import assert_params_false, to_default_float
from ..utilities.ops import pca_reduce
from .gpr import GPR
from .model import GPModel
from .training_mixins import InternalDataTrainingLossMixin
from .util import data_input_to_tensor, inducingpoint_wrapper

__all__ = ["BayesianGPLVM", "GPLVM"]


def _psi2_projection(L: jax.Array, psi2: jax.Array) -> jax.Array:
    """L^-1 psi2 L^-T, the projected second psi statistic.

    In float64 this is the reference's two triangular solves. In reduced
    precision that construction is NOT positive semi-definite under rounding
    (psi2 itself rounds indefinite at ~eps * lambda_max, and the solves
    amplify by kappa(Kuu)), so the Cholesky of AAT + I NaNs. Fix: take the
    VALUE from an eigenvalue-clipped Gram factorization (PSD by
    construction, and matching the solve formulation to ~1e-3 relative — a
    diagonal-jitter variant instead inflates the bound by tr(Kuu^-1)*delta),
    while the GRADIENT flows through the smooth triangular-solve expression
    (eigh's own VJP blows up on psi2's near-degenerate spectrum).
    """
    tmp = solve_triangular(L, psi2, lower=True)
    aat = solve_triangular(L, jnp.transpose(tmp), lower=True)
    if L.dtype == jnp.float64:
        return aat

    def psd_value(psi2_v: jax.Array, L_v: jax.Array) -> jax.Array:
        psi2_v = 0.5 * (psi2_v + jnp.transpose(psi2_v))
        w, V = jnp.linalg.eigh(psi2_v)
        C0 = V * jnp.sqrt(jnp.maximum(w, 0.0))
        C = solve_triangular(L_v, C0, lower=True)
        return C @ jnp.transpose(C)

    correction = psd_value(jax.lax.stop_gradient(psi2), jax.lax.stop_gradient(L)) \
        - jax.lax.stop_gradient(aat)
    return aat + correction


class GPLVM(GPR):
    """Standard GPLVM: GPR whose inputs X are a trainable latent Parameter,
    PCA-initialized (reference ``gplvm.py:37-81``)."""

    @check_shapes(
        "data: [N, P]",
        "X_data_mean: [N, Q]",
    )
    def __init__(
        self,
        data: OutputData,
        latent_dim: int,
        X_data_mean: Optional[TensorType] = None,
        kernel: Optional[Kernel] = None,
        mean_function: Optional[MeanFunction] = None,
    ):
        if X_data_mean is None:
            X_data_mean = pca_reduce(jnp.asarray(data, default_float()), latent_dim)

        num_latent_gps = X_data_mean.shape[1]
        if num_latent_gps != latent_dim:
            raise ValueError(
                f"Passed in number of latent {latent_dim} does not match initial X {num_latent_gps}."
            )

        if mean_function is None:
            mean_function = Zero()
        if kernel is None:
            kernel = kernels_module.SquaredExponential(lengthscales=np.ones(latent_dim))
        if data.shape[1] < num_latent_gps:
            raise ValueError("More latent dimensions than observed.")

        gpr_data = (Parameter(X_data_mean, name="X_data_mean"), data_input_to_tensor(data))
        super().__init__(gpr_data, kernel, mean_function=mean_function)


class BayesianGPLVM(GPModel, InternalDataTrainingLossMixin):
    """Titsias-style variational GPLVM with a diagonal Gaussian q(X)
    (reference ``gplvm.py:84-280``); the ELBO uses the analytic psi0/1/2
    statistics from the expectations framework."""

    @check_shapes(
        "data: [N, P]",
        "X_data_mean: [N, Q]",
        "X_data_var: [N, Q]",
        "X_prior_mean: [N, Q]",
        "X_prior_var: [N, Q]",
    )
    def __init__(
        self,
        data: OutputData,
        X_data_mean: TensorType,
        X_data_var: TensorType,
        kernel: Kernel,
        num_inducing_variables: Optional[int] = None,
        inducing_variable=None,
        X_prior_mean: Optional[TensorType] = None,
        X_prior_var: Optional[TensorType] = None,
    ):
        num_data, num_latent_gps = X_data_mean.shape
        super().__init__(kernel, Gaussian(), num_latent_gps=num_latent_gps)
        self.data = data_input_to_tensor(data)

        self.X_data_mean = Parameter(X_data_mean, name="X_data_mean")
        self.X_data_var = Parameter(X_data_var, transform=positive(), name="X_data_var")

        self.num_data = num_data
        self.output_dim = self.data.shape[-1]

        if (inducing_variable is None) == (num_inducing_variables is None):
            raise ValueError(
                "BayesianGPLVM needs exactly one of `inducing_variable` and"
                " `num_inducing_variables`"
            )

        if inducing_variable is None:
            # initialize with a random subset of the initial latent points
            perm = np.random.permutation(num_data)[:num_inducing_variables]
            Z = np.asarray(X_data_mean)[perm]
            inducing_variable = InducingPoints(Z)

        self.inducing_variable = inducingpoint_wrapper(inducing_variable)

        assert X_data_mean.shape[1] == self.num_latent_gps

        if X_prior_mean is None:
            X_prior_mean = jnp.zeros((self.num_data, self.num_latent_gps), dtype=default_float())
        if X_prior_var is None:
            X_prior_var = jnp.ones((self.num_data, self.num_latent_gps))

        self.X_prior_mean = jnp.asarray(np.atleast_1d(np.asarray(X_prior_mean)), default_float())
        self.X_prior_var = jnp.asarray(np.atleast_1d(np.asarray(X_prior_var)), default_float())
        # [N, Q] like the reference's check_shapes (gplvm.py:116-127): a
        # broadcastable-but-wrong shape (e.g. per-dimension [Q]) would make
        # the KL's sum(log(X_prior_var)) silently lose a factor of N
        expected = (self.num_data, self.num_latent_gps)
        for name, arr in (
            ("X_prior_mean", self.X_prior_mean),
            ("X_prior_var", self.X_prior_var),
        ):
            if tuple(arr.shape) != expected:
                raise ValueError(
                    f"{name} must have shape [num_data, num_latent_gps] = "
                    f"{expected}, got {tuple(arr.shape)}"
                )

    @check_shapes("return: []")
    def maximum_log_likelihood_objective(self) -> jax.Array:
        return self.elbo()

    @check_shapes("return: []")
    def elbo(self) -> jax.Array:
        """Titsias-style collapsed bound with psi statistics + X-prior KL
        (reference ``gplvm.py:159-216``)."""
        Y_data = self.data

        pX = DiagonalGaussian(self.X_data_mean.value, self.X_data_var.value)

        num_inducing = self.inducing_variable.num_inducing
        psi0 = jnp.sum(expectation(pX, self.kernel))
        psi1 = expectation(pX, (self.kernel, self.inducing_variable))
        psi2 = jnp.sum(
            expectation(
                pX, (self.kernel, self.inducing_variable), (self.kernel, self.inducing_variable)
            ),
            axis=0,
        )
        cov_uu = Kuu(self.inducing_variable, self.kernel, jitter=default_jitter())
        L = jnp.linalg.cholesky(cov_uu)
        sigma2 = self.likelihood.variance.value

        A = solve_triangular(L, jnp.transpose(psi1), lower=True)
        AAT = _psi2_projection(L, psi2) / sigma2
        B = AAT + jnp.eye(num_inducing, dtype=default_float())
        LB = jnp.linalg.cholesky(B)
        log_det_B = 2.0 * jnp.sum(jnp.log(jnp.diag(LB)))
        c = solve_triangular(LB, A @ Y_data, lower=True) / sigma2

        # KL[q(x) || p(x)]
        dX_data_var = self.X_data_var.value
        NQ = to_default_float(self.X_data_mean.value.size)
        D = to_default_float(Y_data.shape[1])
        KL = -0.5 * jnp.sum(jnp.log(dX_data_var))
        KL += 0.5 * jnp.sum(jnp.log(self.X_prior_var))
        KL -= 0.5 * NQ
        KL += 0.5 * jnp.sum(
            (jnp.square(self.X_data_mean.value - self.X_prior_mean) + dX_data_var)
            / self.X_prior_var
        )

        ND = to_default_float(Y_data.size)
        bound = -0.5 * ND * jnp.log(2 * np.pi * sigma2)
        bound += -0.5 * D * log_det_B
        bound += -0.5 * jnp.sum(jnp.square(Y_data)) / sigma2
        bound += 0.5 * jnp.sum(jnp.square(c))
        bound += -0.5 * D * (psi0 / sigma2 - jnp.sum(jnp.diag(AAT)))
        bound -= KL
        return bound

    @inherit_check_shapes
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """SGPR-style prediction through the psi statistics
        (reference ``gplvm.py:218-274``)."""
        assert_params_false(self.predict_f, full_output_cov=full_output_cov)

        pX = DiagonalGaussian(self.X_data_mean.value, self.X_data_var.value)

        Y_data = self.data
        num_inducing = self.inducing_variable.num_inducing
        psi1 = expectation(pX, (self.kernel, self.inducing_variable))
        psi2 = jnp.sum(
            expectation(
                pX, (self.kernel, self.inducing_variable), (self.kernel, self.inducing_variable)
            ),
            axis=0,
        )
        jitter = default_jitter()
        Kus = Kuf(self.inducing_variable, self.kernel, Xnew)
        sigma2 = self.likelihood.variance.value
        L = jnp.linalg.cholesky(Kuu(self.inducing_variable, self.kernel, jitter=jitter))

        A = solve_triangular(L, jnp.transpose(psi1), lower=True)
        AAT = _psi2_projection(L, psi2) / sigma2
        B = AAT + jnp.eye(num_inducing, dtype=default_float())
        LB = jnp.linalg.cholesky(B)
        c = solve_triangular(LB, A @ Y_data, lower=True) / sigma2
        tmp1 = solve_triangular(L, Kus, lower=True)
        tmp2 = solve_triangular(LB, tmp1, lower=True)
        mean = tmp2.T @ c
        if full_cov:
            var = self.kernel(Xnew) + tmp2.T @ tmp2 - tmp1.T @ tmp1
            var = jnp.broadcast_to(var[None], (Y_data.shape[1],) + var.shape)
        else:
            var = (
                self.kernel(Xnew, full_cov=False)
                + jnp.sum(jnp.square(tmp2), axis=0)
                - jnp.sum(jnp.square(tmp1), axis=0)
            )
            var = jnp.broadcast_to(var[:, None], var.shape + (Y_data.shape[1],))
        return mean + self.mean_function(Xnew), var

    @inherit_check_shapes
    def predict_log_density(
        self, data: RegressionData, full_cov: bool = False, full_output_cov: bool = False
    ) -> jax.Array:
        raise NotImplementedError
