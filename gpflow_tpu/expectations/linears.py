"""Analytic expectations for the Linear kernel (reference
``/root/reference/gpflow/expectations/linears.py``)."""
from __future__ import annotations

from typing import Type

import jax
import jax.numpy as jnp

from .. import kernels
from .. import functions as mfn
from ..inducing_variables import InducingPoints
from ..probability_distributions import DiagonalGaussian, Gaussian, MarkovGaussian
from ..utilities.shapes import check_shapes
from . import dispatch
from .expectations import expectation

NoneType: Type[None] = type(None)


@dispatch.expectation.register(Gaussian, kernels.Linear, NoneType, NoneType, NoneType)
@check_shapes("p: [N, D]", "return: [N]")
def _expectation_gaussian_linear(p, kernel, _, __, ___, nghp=None):
    """<diag(K(X, X))>_p(X) -> [N] (reference ``linears.py:30-54``)."""
    Xmu, _ = kernel.slice(p.mu, None)
    Xcov = kernel.slice_cov(p.cov)
    return jnp.sum(
        kernel.variance * (jnp.diagonal(Xcov, axis1=-2, axis2=-1) + Xmu ** 2), 1
    )


@dispatch.expectation.register(Gaussian, kernels.Linear, InducingPoints, NoneType, NoneType)
@check_shapes("p: [N, D]", "inducing_variable: [M, D, P]", "return: [N, M]")
def _expectation_gaussian_linear_inducingpoints(p, kernel, inducing_variable, _, __, nghp=None):
    """<K(X, Z)>_p(X) -> [N, M] (reference ``linears.py:57-79``)."""
    Z, Xmu = kernel.slice(inducing_variable.Z.value, p.mu)
    return Xmu @ jnp.transpose(Z * kernel.variance)


@dispatch.expectation.register(Gaussian, kernels.Linear, InducingPoints, mfn.Identity, NoneType)
@check_shapes("p: [N, D]", "inducing_variable: [M, D, P]", "return: [N, M, D]")
def _expectation_gaussian_linear_inducingpoints__identity(
    p, kernel, inducing_variable, mean, _, nghp=None
):
    """<K(Z, x_n) x_n^T>_p(x_n) -> [N, M, D] (reference ``linears.py:82-105``)."""
    Xmu, Xcov = p.mu, p.cov
    N = Xmu.shape[0]
    var_Z = kernel.variance * inducing_variable.Z.value  # [M, D]
    tiled_Z = jnp.broadcast_to(var_Z[None], (N,) + var_Z.shape)  # [N, M, D]
    return jnp.matmul(tiled_Z, Xcov + (Xmu[..., None] * Xmu[:, None, :]))


@dispatch.expectation.register(
    MarkovGaussian, kernels.Linear, InducingPoints, mfn.Identity, NoneType
)
@check_shapes("p: [N, D]", "inducing_variable: [M, D, P]", "return: [N, M, D]")
def _expectation_markov_linear_inducingpoints__identity(
    p, kernel, inducing_variable, mean, _, nghp=None
):
    """<K(Z, x_n) x_{n+1}^T>_p -> [N, M, D] (reference ``linears.py:108-131``)."""
    Xmu, Xcov = p.mu, p.cov
    N = Xmu.shape[0] - 1
    var_Z = kernel.variance * inducing_variable.Z.value
    tiled_Z = jnp.broadcast_to(var_Z[None], (N,) + var_Z.shape)
    eXX = Xcov[1, :-1] + (Xmu[:-1][..., None] * Xmu[1:][:, None, :])  # [N, D, D]
    return jnp.matmul(tiled_Z, eXX)


@dispatch.expectation.register(
    (Gaussian, DiagonalGaussian), kernels.Linear, InducingPoints, kernels.Linear, InducingPoints
)
@check_shapes("p: [N, D]", "feat1: [M, D, P]", "feat2: [M, D, P]", "return: [N, M, M]")
def _expectation_gaussian_linear_inducingpoints__linear_inducingpoints(
    p, kern1, feat1, kern2, feat2, nghp=None
):
    """<K(Z, x_n) K(x_n, Z)>_p(x_n) -> [N, M, M] (reference ``linears.py:134-192``)."""
    if kern1.on_separate_dims(kern2) and isinstance(p, DiagonalGaussian):
        eKxz1 = expectation(p, (kern1, feat1))
        eKxz2 = expectation(p, (kern2, feat2))
        return eKxz1[:, :, None] * eKxz2[:, None, :]

    if kern1 is not kern2 or feat1 is not feat2:
        raise NotImplementedError(
            "The expectation over two kernels has only an "
            "analytical implementation if both kernels are equal."
        )

    kernel = kern1
    inducing_variable = feat1

    Xcov = kernel.slice_cov(
        jax.vmap(jnp.diag)(p.cov) if isinstance(p, DiagonalGaussian) else p.cov
    )
    Z, Xmu = kernel.slice(inducing_variable.Z.value, p.mu)

    N = Xmu.shape[0]
    var_Z = kernel.variance * Z
    tiled_Z = jnp.broadcast_to(var_Z[None], (N,) + var_Z.shape)  # [N, M, D]
    XX = Xcov + Xmu[:, None, :] * Xmu[:, :, None]  # [N, D, D]
    return jnp.matmul(jnp.matmul(tiled_Z, XX), jnp.swapaxes(tiled_Z, -1, -2))
