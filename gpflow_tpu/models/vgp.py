"""Variational GP over function values at the data (Opper & Archambeau form)
(reference ``/root/reference/gpflow/models/vgp.py``).

Deviation (SURVEY.md A.5.1): static shapes — ``num_data`` is a Python int, and
``update_vgp_data`` replaces the data/variational parameters (triggering a jit
retrace, since shapes change anyway) instead of assigning to dynamic-shape
variables.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from .. import posteriors
from ..base import InputData, MeanAndVariance, Parameter, RegressionData
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..bijectors import positive, triangular
from ..conditionals import conditional
from ..config import default_float, default_jitter
from ..functions import MeanFunction
from ..kernels import Kernel
from ..kullback_leiblers import gauss_kl
from ..likelihoods import Likelihood
from ..utilities import assert_params_false
from .model import GPModel
from .training_mixins import InternalDataTrainingLossMixin
from .util import data_input_to_tensor

__all__ = [
    "VGP",
    "VGPOpperArchambeau",
    "VGP_deprecated",
    "VGP_with_posterior",
    "update_vgp_data",
]


class VGP_deprecated(GPModel, InternalDataTrainingLossMixin):
    """Whitened full-rank Gaussian approximation over f(X)
    (reference ``vgp.py:37-160``). Equivalent to SVGP with Z=X but cheaper."""

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
        X_data, _Y_data = self.data
        self.num_data = X_data.shape[0]

        self.q_mu = Parameter(
            np.zeros((self.num_data, self.num_latent_gps)), name="q_mu"
        )
        q_sqrt = np.stack([np.eye(self.num_data) for _ in range(self.num_latent_gps)])
        self.q_sqrt = Parameter(q_sqrt, transform=triangular(), name="q_sqrt")

    @check_shapes("return: []")
    def maximum_log_likelihood_objective(self) -> jax.Array:
        return self.elbo()

    @check_shapes("return: []")
    def elbo(self) -> jax.Array:
        """E_q[log p(Y|F)] - KL[q(F) || p(F)] in the whitened parametrization
        (reference ``vgp.py:108-143``)."""
        X_data, Y_data = self.data
        num_data = self.num_data

        KL = gauss_kl(self.q_mu.value, self.q_sqrt.value)

        K = self.kernel(X_data) + jnp.eye(num_data, dtype=default_float()) * default_jitter()
        L = jnp.linalg.cholesky(K)
        fmean = L @ self.q_mu.value + self.mean_function(X_data)  # [N, D]
        q_sqrt_dnn = jnp.tril(self.q_sqrt.value)  # [D, N, N]
        LTA = jnp.matmul(L[None], q_sqrt_dnn)  # [D, N, N]
        fvar = jnp.sum(jnp.square(LTA), axis=2)  # [D, N]
        fvar = jnp.transpose(fvar)  # [N, D]

        var_exp = self.likelihood.variational_expectations(X_data, fmean, fvar, Y_data)
        return jnp.sum(var_exp) - KL

    @inherit_check_shapes
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        assert_params_false(self.predict_f, full_output_cov=full_output_cov)
        X_data, _Y_data = self.data
        mu, var = conditional(
            Xnew,
            X_data,
            self.kernel,
            self.q_mu.value,
            q_sqrt=self.q_sqrt.value,
            full_cov=full_cov,
            white=True,
        )
        return mu + self.mean_function(Xnew), var


class VGP_with_posterior(VGP_deprecated):
    """Adds cached-posterior prediction (reference ``vgp.py:163-221``)."""

    def posterior(
        self,
        precompute_cache: posteriors.PrecomputeCacheType = posteriors.PrecomputeCacheType.TENSOR,
    ) -> posteriors.VGPPosterior:
        X_data, _Y_data = self.data
        return posteriors.VGPPosterior(
            self.kernel,
            X_data,
            self.q_mu,
            self.q_sqrt,
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


class VGP(VGP_with_posterior):
    """Variational GP regression/classification over f(X)."""


@check_shapes(
    "new_data[0]: [N, D]",
    "new_data[1]: [N, P]",
)
def update_vgp_data(vgp: VGP_deprecated, new_data: RegressionData) -> None:
    """Sets new data on a VGP and re-fits its variational parameters to keep
    the same posterior (reference ``vgp.py:224-263``): the whitened
    re-parameterization q_mu' = Lnn^-1 f_mu, S_v = Lnn^-1 f_cov Lnn^-T,
    q_sqrt' = chol(S_v + jitter) (SURVEY.md A.2). Used in Bayesian-optimization
    loops that grow the dataset."""
    new_X_data, new_Y_data = data_input_to_tensor(new_data)
    new_num_data = new_X_data.shape[0]
    f_mu, f_cov = vgp.predict_f(new_X_data, full_cov=True)  # [N, L], [L, N, N]

    Knn = vgp.kernel(new_X_data, full_cov=True)
    jitter_mat = default_jitter() * jnp.eye(new_num_data, dtype=Knn.dtype)
    Lnn = jnp.linalg.cholesky(Knn + jitter_mat)
    new_q_mu = solve_triangular(Lnn, f_mu, lower=True)
    # materialize the latent batch dim: triangular_solve requires matching
    # batch sizes (no [1,N,N] vs [L,N,N] broadcast)
    Lnn_b = jnp.broadcast_to(Lnn[None], f_cov.shape)
    tmp = solve_triangular(Lnn_b, f_cov, lower=True)  # L^-1 f_cov
    S_v = solve_triangular(Lnn_b, jnp.swapaxes(tmp, -1, -2), lower=True)
    new_q_sqrt = jnp.linalg.cholesky(S_v + jitter_mat)

    vgp.data = (new_X_data, new_Y_data)
    vgp.num_data = new_num_data
    vgp.q_mu = Parameter(new_q_mu, name="q_mu")
    vgp.q_sqrt = Parameter(new_q_sqrt, transform=triangular(), name="q_sqrt")


class VGPOpperArchambeau(GPModel, InternalDataTrainingLossMixin):
    """2ND-parameter variational GP (Opper & Archambeau 2009;
    reference ``vgp.py:266-419``)."""

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
        X_data, _Y_data = self.data
        self.num_data = X_data.shape[0]
        self.q_alpha = Parameter(np.zeros((self.num_data, self.num_latent_gps)), name="q_alpha")
        self.q_lambda = Parameter(
            np.ones((self.num_data, self.num_latent_gps)), transform=positive(), name="q_lambda"
        )

    @check_shapes("return: []")
    def maximum_log_likelihood_objective(self) -> jax.Array:
        return self.elbo()

    @check_shapes("return: []")
    def elbo(self) -> jax.Array:
        """q(f) = N(f | K alpha + mean, [K^-1 + diag(lambda^2)]^-1)
        (reference ``vgp.py:310-360``)."""
        X_data, Y_data = self.data

        K = self.kernel(X_data)
        K_alpha = K @ self.q_alpha.value
        f_mean = K_alpha + self.mean_function(X_data)

        I = jnp.broadcast_to(
            jnp.eye(self.num_data, dtype=default_float())[None, ...],
            (self.num_latent_gps, self.num_data, self.num_data),
        )
        lam_t = jnp.transpose(self.q_lambda.value)  # [L, N]
        A = I + lam_t[:, None, :] * lam_t[:, :, None] * K
        L = jnp.linalg.cholesky(A)
        Li = solve_triangular(L, I, lower=True)
        tmp = Li / lam_t[:, None, :]
        f_var = 1.0 / jnp.square(self.q_lambda.value) - jnp.transpose(
            jnp.sum(jnp.square(tmp), axis=1)
        )

        A_logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
        trAi = jnp.sum(jnp.square(Li))

        KL = 0.5 * (
            A_logdet
            + trAi
            - self.num_data * self.num_latent_gps
            + jnp.sum(K_alpha * self.q_alpha.value)
        )

        v_exp = self.likelihood.variational_expectations(X_data, f_mean, f_var, Y_data)
        return jnp.sum(v_exp) - KL

    @inherit_check_shapes
    def predict_f(
        self, Xnew: InputData, full_cov: bool = False, full_output_cov: bool = False
    ) -> MeanAndVariance:
        """q(F*) = N(F* | K_{*f} alpha + mean, K_** - K_{*f}[K + diag(lambda^-2)]^-1 K_{f*})
        (reference ``vgp.py:362-419``)."""
        assert_params_false(self.predict_f, full_output_cov=full_output_cov)

        X_data, _ = self.data
        Kx = self.kernel(X_data, Xnew)
        K = self.kernel(X_data)

        f_mean = Kx.T @ self.q_alpha.value + self.mean_function(Xnew)

        inv_lam_sq = jnp.transpose(1.0 / jnp.square(self.q_lambda.value))  # [L, N]
        A = K + jax.vmap(jnp.diag)(inv_lam_sq)
        L = jnp.linalg.cholesky(A)
        Kx_tiled = jnp.broadcast_to(Kx[None, ...], (self.num_latent_gps,) + Kx.shape)
        LiKx = solve_triangular(L, Kx_tiled, lower=True)
        if full_cov:
            f_var = self.kernel(Xnew) - jnp.matmul(jnp.swapaxes(LiKx, -1, -2), LiKx)
        else:
            f_var = self.kernel(Xnew, full_cov=False) - jnp.sum(jnp.square(LiKx), axis=1)
        return f_mean, jnp.transpose(f_var) if not full_cov else f_var
