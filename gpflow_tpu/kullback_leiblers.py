"""KL divergences (reference ``/root/reference/gpflow/kullback_leiblers.py``)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .base import TensorType
from .config import default_float, default_jitter
from .covariances import Kuu
from .inducing_variables import InducingVariables
from .kernels import Kernel
from .utilities import Dispatcher
from .utilities.shapes import check_shapes

__all__ = ["gauss_kl", "prior_kl"]

prior_kl = Dispatcher("prior_kl")


@prior_kl.register(InducingVariables, Kernel, object, object)
@check_shapes(
    "inducing_variable: [N, D, broadcast L]",
    "q_mu: [M, L]",
    "q_sqrt: [M, L] | [L, M, M]",
    "return: []",
)
def _prior_kl_default(
    inducing_variable: InducingVariables,
    kernel: Kernel,
    q_mu: TensorType,
    q_sqrt: TensorType,
    whiten: bool = False,
) -> jax.Array:
    """Whitened -> KL to N(0, I); else KL to N(0, Kuu)
    (reference ``kullback_leiblers.py:31-49``)."""
    if whiten:
        return gauss_kl(q_mu, q_sqrt, None)
    K = Kuu(inducing_variable, kernel, jitter=default_jitter())  # [L, M, M] or [M, M]
    if K.ndim == 4:
        # Fully-correlated path (InducingPoints x MultioutputKernel): Kuu is
        # [M, P, M, P]; q_mu/q_sqrt are over the row-major-flattened [MP]
        # vector, so the prior is N(0, Kuu reshaped to [MP, MP]).  The
        # reference's gauss_kl contract only admits [L, M, M]-broadcastable K
        # and its tests never hit this case unwhitened; we support it.
        MP = K.shape[0] * K.shape[1]
        K = jnp.reshape(K, (MP, MP))
    return gauss_kl(q_mu, q_sqrt, K)


@check_shapes(
    "q_mu: [M, L]",
    "q_sqrt: [M, L] | [L, M, M]",
    "return: []",
)
def gauss_kl(
    q_mu: TensorType,
    q_sqrt: TensorType,
    K: Optional[TensorType] = None,
    *,
    K_cholesky: Optional[TensorType] = None,
) -> jax.Array:
    """KL[q || p] for q = N(q_mu, q_sqrt q_sqrt^T), p = N(0, K) (or N(0, I) if
    K and K_cholesky are both None). Sums over the L independent distributions
    in the columns of q_mu (reference ``kullback_leiblers.py:52-165``).

    q_mu: [M, L]; q_sqrt: [M, L] (diag) or [L, M, M] (tril);
    K / K_cholesky: [M, M] or [L, M, M].
    """
    if (K is not None) and (K_cholesky is not None):
        raise ValueError(
            "Ambiguous arguments: gauss_kl() must only be passed one of `K` or `K_cholesky`."
        )

    q_mu = jnp.asarray(q_mu)
    q_sqrt = jnp.asarray(q_sqrt)
    is_white = (K is None) and (K_cholesky is None)
    is_diag = q_sqrt.ndim == 2

    M, L = q_mu.shape

    if is_white:
        alpha = q_mu  # [M, L]
        Lp = None
        is_batched = False
    else:
        if K is not None:
            Lp = jnp.linalg.cholesky(jnp.asarray(K))  # [L, M, M] or [M, M]
        else:
            Lp = jnp.asarray(K_cholesky)
        is_batched = Lp.ndim == 3
        q_mu_p = jnp.transpose(q_mu)[:, :, None] if is_batched else q_mu  # [L, M, 1] or [M, L]
        alpha = solve_triangular(Lp, q_mu_p, lower=True)

    if is_diag:
        Lq_diag = q_sqrt  # [M, L]
        Lq_sq_sum = jnp.sum(jnp.square(q_sqrt))
        Lq_full = jax.vmap(jnp.diag)(jnp.transpose(q_sqrt))  # [L, M, M]
    else:
        Lq_full = jnp.tril(q_sqrt)  # [L, M, M]
        Lq_diag = jnp.transpose(jnp.diagonal(Lq_full, axis1=-2, axis2=-1))  # [M, L]
        Lq_sq_sum = jnp.sum(jnp.square(Lq_full))

    # Mahalanobis term: mu_q^T Sigma_p^-1 mu_q
    mahalanobis = jnp.sum(jnp.square(alpha))

    # Constant term: -L*M
    constant = -jnp.asarray(M * L, dtype=default_float())

    # Log-determinant of q covariance
    logdet_qcov = jnp.sum(jnp.log(jnp.square(Lq_diag)))

    # Trace term tr(Sigma_p^-1 Sigma_q)
    if is_white:
        trace = Lq_sq_sum
    else:
        if is_diag and not is_batched:
            # fast path: K [M, M], q_sqrt diagonal [M, L] (reference :136-145)
            Lp_inv = solve_triangular(Lp, jnp.eye(M, dtype=Lp.dtype), lower=True)
            K_inv_diag = jnp.diagonal(
                solve_triangular(jnp.transpose(Lp), Lp_inv, lower=False)
            )[:, None]  # [M, 1]
            trace = jnp.sum(K_inv_diag * jnp.square(q_sqrt))
        else:
            Lp_full = Lp if is_batched else jnp.broadcast_to(Lp, (L, M, M))
            LpiLq = solve_triangular(Lp_full, Lq_full, lower=True)
            trace = jnp.sum(jnp.square(LpiLq))

    twoKL = mahalanobis + constant - logdet_qcov + trace

    # Log-determinant of p covariance
    if not is_white:
        log_sqdiag_Lp = jnp.log(jnp.square(jnp.diagonal(Lp, axis1=-2, axis2=-1)))
        sum_log_sqdiag_Lp = jnp.sum(log_sqdiag_Lp)
        scale = 1.0 if is_batched else jnp.asarray(L, dtype=default_float())
        twoKL += scale * sum_log_sqdiag_Lp

    return 0.5 * twoKL
