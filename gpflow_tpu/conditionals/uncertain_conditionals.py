"""Conditional with uncertain (Gaussian) inputs via psi statistics (reference
``/root/reference/gpflow/conditionals/uncertain_conditionals.py:39-148``)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..base import MeanAndVariance, TensorType
from ..utilities.shapes import check_shapes
from ..config import default_float, default_jitter
from ..covariances import Kuu
from ..expectations import expectation
from ..functions import MeanFunction, Zero
from ..inducing_variables import InducingPoints, InducingVariables
from ..kernels import Kernel
from ..probability_distributions import Gaussian

__all__ = ["uncertain_conditional"]


@check_shapes(
    "Xnew_mu: [batch..., N, Din]",
    "Xnew_var: [batch..., N, n, n]",
    "inducing_variable: [M, Din, maybe_t...]",
    "q_mu: [M, Dout]",
    "q_sqrt: [t, M, M]",
    "return[0]: [batch..., N, Dout]",
    "return[1]: [batch..., N, t, t] if full_output_cov",
    "return[1]: [batch..., N, Dout] if not full_output_cov",
)
def uncertain_conditional(
    Xnew_mu: TensorType,
    Xnew_var: TensorType,
    inducing_variable: InducingVariables,
    kernel: Kernel,
    q_mu: TensorType,
    q_sqrt: TensorType,
    *,
    mean_function: Optional[MeanFunction] = None,
    full_output_cov: bool = False,
    full_cov: bool = False,
    white: bool = False,
) -> MeanAndVariance:
    """Conditional for p(Xnew) = N(Xnew_mu, Xnew_var); moments marginalized
    over the input uncertainty using psi0/psi1/psi2."""
    if not isinstance(inducing_variable, InducingPoints):
        raise NotImplementedError
    if full_cov:
        raise NotImplementedError(
            "uncertain_conditional() currently does not support full_cov=True"
        )

    Xnew_mu = jnp.asarray(Xnew_mu)
    Xnew_var = jnp.asarray(Xnew_var)
    q_mu = jnp.asarray(q_mu)
    q_sqrt = jnp.asarray(q_sqrt)

    pXnew = Gaussian(Xnew_mu, Xnew_var)

    num_data = Xnew_mu.shape[0]  # N
    num_ind, num_func = q_mu.shape  # M, D
    q_sqrt_r = jnp.tril(q_sqrt)  # [D, M, M]

    eKuf = jnp.transpose(expectation(pXnew, (kernel, inducing_variable)))  # [M, N] (psi1)
    Kuu_v = Kuu(inducing_variable, kernel, jitter=default_jitter())
    Luu = jnp.linalg.cholesky(Kuu_v)  # [M, M]

    if not white:
        q_mu = solve_triangular(Luu, q_mu, lower=True)
        Luu_tiled = jnp.broadcast_to(Luu[None], (num_func,) + Luu.shape)
        q_sqrt_r = solve_triangular(Luu_tiled, q_sqrt_r, lower=True)

    Li_eKuf = solve_triangular(Luu, eKuf, lower=True)  # [M, N]
    fmean = Li_eKuf.T @ q_mu

    eKff = expectation(pXnew, kernel)  # [N] (psi0)
    eKuffu = expectation(
        pXnew, (kernel, inducing_variable), (kernel, inducing_variable)
    )  # [N, M, M] (psi2)
    Luu_tiled = jnp.broadcast_to(Luu[None], (num_data,) + Luu.shape)
    Li_eKuffu = solve_triangular(Luu_tiled, eKuffu, lower=True)
    Li_eKuffu_Lit = solve_triangular(
        Luu_tiled, jnp.swapaxes(Li_eKuffu, -1, -2), lower=True
    )  # [N, M, M]
    cov = jnp.matmul(q_sqrt_r, jnp.swapaxes(q_sqrt_r, -1, -2))  # [D, M, M]

    if mean_function is None or isinstance(mean_function, Zero):
        e_related_to_mean = jnp.zeros((num_data, num_func, num_func), dtype=default_float())
    else:
        fmean = fmean + expectation(pXnew, mean_function)
        e_mean_mean = expectation(pXnew, mean_function, mean_function)  # [N, D, D]
        Lit_q_mu = solve_triangular(Luu, q_mu, lower=True, trans=1)
        e_mean_Kuf = expectation(pXnew, mean_function, (kernel, inducing_variable))  # [N, D, M]
        e_mean_Kuf = jnp.reshape(e_mean_Kuf, (num_data, num_func, num_ind))
        e_fmean_mean = jnp.einsum("nqm,mz->nqz", e_mean_Kuf, Lit_q_mu)  # [N, D, D]
        e_related_to_mean = e_fmean_mean + jnp.swapaxes(e_fmean_mean, -1, -2) + e_mean_mean

    trace_term = jnp.trace(Li_eKuffu_Lit, axis1=-2, axis2=-1)  # [N]

    if full_output_cov:
        fvar = (
            jax.vmap(jnp.diag)(
                jnp.broadcast_to((eKff - trace_term)[:, None], (num_data, num_func))
            )
            + jax.vmap(jnp.diag)(jnp.einsum("nij,dji->nd", Li_eKuffu_Lit, cov))
            + jnp.einsum("ig,nij,jh->ngh", q_mu, Li_eKuffu_Lit, q_mu)
            - fmean[:, :, None] * fmean[:, None, :]
            + e_related_to_mean
        )
    else:
        fvar = (
            (eKff - trace_term)[:, None]
            + jnp.einsum("nij,dji->nd", Li_eKuffu_Lit, cov)
            + jnp.einsum("ig,nij,jg->ng", q_mu, Li_eKuffu_Lit, q_mu)
            - fmean ** 2
            + jnp.diagonal(e_related_to_mean, axis1=-2, axis2=-1)
        )

    return fmean, fvar
