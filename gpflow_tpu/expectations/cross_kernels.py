"""Cross SquaredExponential x Linear expectations (reference
``/root/reference/gpflow/expectations/cross_kernels.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, solve_triangular

from .. import kernels
from ..inducing_variables import InducingPoints
from ..probability_distributions import DiagonalGaussian, Gaussian
from ..utilities.shapes import check_shapes
from . import dispatch
from .expectations import expectation


@dispatch.expectation.register(
    (Gaussian, DiagonalGaussian),
    kernels.SquaredExponential,
    InducingPoints,
    kernels.Linear,
    InducingPoints,
)
@check_shapes("p: [N, D]", "feat1: [M1, D, P]", "feat2: [M2, D, P]", "return: [N, M1, M2]")
def _expectation_gaussian_sqe_inducingpoints__linear_inducingpoints(
    p, sqexp_kern, feat1, lin_kern, feat2, nghp=None
):
    """<Ka(Z1, x_n) Kb(x_n, Z2)>_p(x_n) for SqExp x Linear -> [N, M1, M2]
    (reference ``cross_kernels.py:28-124``)."""
    if sqexp_kern.on_separate_dims(lin_kern) and isinstance(p, DiagonalGaussian):
        eKxz1 = expectation(p, (sqexp_kern, feat1))
        eKxz2 = expectation(p, (lin_kern, feat2))
        return eKxz1[:, :, None] * eKxz2[:, None, :]

    if feat1 is not feat2:
        raise NotImplementedError("inducing_variables have to be the same for both kernels.")
    if sqexp_kern.active_dims != lin_kern.active_dims:
        raise NotImplementedError("active_dims have to be the same for both kernels.")

    Xcov = sqexp_kern.slice_cov(
        jax.vmap(jnp.diag)(p.cov) if isinstance(p, DiagonalGaussian) else p.cov
    )
    Z, Xmu = sqexp_kern.slice(feat1.Z.value, p.mu)

    N, D = Xmu.shape

    def take_with_ard(value):
        value = jnp.asarray(value)
        if not sqexp_kern.ard:
            return jnp.zeros((D,), dtype=value.dtype) + value
        return value

    lin_kern_variances = take_with_ard(lin_kern.variance.value)
    sqexp_kern_lengthscales = take_with_ard(sqexp_kern.lengthscales.value)

    chol_L_plus_Xcov = jnp.linalg.cholesky(
        jnp.diag(sqexp_kern_lengthscales ** 2) + Xcov
    )  # [N, D, D]

    Z_transpose = jnp.transpose(Z)
    all_diffs = Z_transpose - Xmu[:, :, None]  # [N, D, M]
    exponent_mahalanobis = solve_triangular(chol_L_plus_Xcov, all_diffs, lower=True)
    exponent_mahalanobis = jnp.sum(jnp.square(exponent_mahalanobis), 1)
    exponent_mahalanobis = jnp.exp(-0.5 * exponent_mahalanobis)  # [N, M]

    sqrt_det_L = jnp.prod(sqexp_kern_lengthscales)
    sqrt_det_L_plus_Xcov = jnp.exp(
        jnp.sum(jnp.log(jnp.diagonal(chol_L_plus_Xcov, axis1=-2, axis2=-1)), axis=1)
    )
    determinants = sqrt_det_L / sqrt_det_L_plus_Xcov
    eKxz_sqexp = sqexp_kern.variance * (determinants[:, None] * exponent_mahalanobis)  # [N, M]

    tiled_Z = jnp.broadcast_to(Z_transpose[None], (N,) + Z_transpose.shape)  # [N, D, M]
    z_L_inv_Xcov = jnp.matmul(
        jnp.swapaxes(tiled_Z, -1, -2), Xcov / sqexp_kern_lengthscales[:, None] ** 2.0
    )  # [N, M, D]

    cross_eKzxKxz = cho_solve(
        (chol_L_plus_Xcov, True),
        (lin_kern_variances * sqexp_kern_lengthscales ** 2.0)[..., None] * tiled_Z,
    )  # [N, D, M]

    cross_eKzxKxz = jnp.matmul(
        (z_L_inv_Xcov + Xmu[:, None, :]) * eKxz_sqexp[..., None], cross_eKzxKxz
    )  # [N, M, M]
    return cross_eKzxKxz


@dispatch.expectation.register(
    (Gaussian, DiagonalGaussian),
    kernels.Linear,
    InducingPoints,
    kernels.SquaredExponential,
    InducingPoints,
)
@check_shapes("p: [N, D]", "feat1: [M1, D, P]", "feat2: [M2, D, P]", "return: [N, M1, M2]")
def _expectation_gaussian_linear_inducingpoints__sqe_inducingpoints(
    p, lin_kern, feat1, sqexp_kern, feat2, nghp=None
):
    """Transpose of the SqExp x Linear case (reference ``cross_kernels.py:127-155``)."""
    return jnp.swapaxes(expectation(p, (sqexp_kern, feat2), (lin_kern, feat1)), -1, -2)
