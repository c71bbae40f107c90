"""Transpose helpers and distribution-conversion fallbacks (reference
``/root/reference/gpflow/expectations/misc.py``)."""
from __future__ import annotations

from typing import Type

import jax
import jax.numpy as jnp

from .. import kernels
from .. import functions as mfn
from ..inducing_variables import InducingPoints, InducingVariables
from ..probability_distributions import DiagonalGaussian, Gaussian, MarkovGaussian
from ..utilities.shapes import check_shapes
from . import dispatch
from .expectations import expectation

NoneType: Type[None] = type(None)


@dispatch.expectation.register(
    (Gaussian, MarkovGaussian), mfn.Identity, NoneType, kernels.Linear, InducingPoints
)
@check_shapes("p: [N, D]", "inducing_variable: [M, D, P]", "return: [N, D, M]")
def _expectation_gaussian__linear_inducingpoints(p, mean, _, kernel, inducing_variable, nghp=None):
    """<x_n K(x_n, Z)>_p as transpose of <K(Z, x_n) x_n^T>_p -> [N, D, M]."""
    return jnp.swapaxes(expectation(p, (kernel, inducing_variable), mean), -1, -2)


@dispatch.expectation.register(
    (Gaussian, MarkovGaussian), kernels.Kernel, InducingVariables, mfn.MeanFunction, NoneType
)
@check_shapes("p: [N, D]", "inducing_variable: [M, D, P]", "return: [N, M, Q]")
def _expectation_gaussian_kernel_inducingvariables__meanfunction(
    p, kernel, inducing_variable, mean, _, nghp=None
):
    """<K(Z, x_n) m(x_n)>_p -> [N, M, Q]."""
    return jnp.swapaxes(expectation(p, mean, (kernel, inducing_variable), nghp=nghp), -1, -2)


@dispatch.expectation.register(Gaussian, mfn.Constant, NoneType, kernels.Kernel, InducingPoints)
@check_shapes("p: [N, D]", "inducing_variable: [M, D, P]", "return: [N, Q, M]")
def _expectation_gaussian_constant__kernel_inducingpoints(
    p, constant_mean, _, kernel, inducing_variable, nghp=None
):
    """<c^T K(x_n, Z)>_p -> [N, Q, M]."""
    c = constant_mean(p.mu)  # [N, Q]
    eKxz = expectation(p, (kernel, inducing_variable), nghp=nghp)  # [N, M]
    return c[..., None] * eKxz[:, None, :]


@dispatch.expectation.register(Gaussian, mfn.Linear, NoneType, kernels.Kernel, InducingPoints)
@check_shapes("p: [N, D]", "inducing_variable: [M, D, P]", "return: [N, Q, M]")
def _expectation_gaussian_linear__kernel_inducingpoints(
    p, linear_mean, _, kernel, inducing_variable, nghp=None
):
    """<(Ax + b)^T K(x_n, Z)>_p -> [N, Q, M]."""
    N, D = p.mu.shape
    exKxz = expectation(p, mfn.Identity(int(D)), (kernel, inducing_variable), nghp=nghp)
    eKxz = expectation(p, (kernel, inducing_variable), nghp=nghp)
    A = jnp.asarray(linear_mean.A)
    b = jnp.asarray(linear_mean.b)
    eAxKxz = jnp.matmul(
        jnp.swapaxes(jnp.broadcast_to(A[None], (N,) + A.shape), -1, -2), exKxz
    )
    ebKxz = b[None, :, None] * eKxz[:, None, :]
    return eAxKxz + ebKxz


@dispatch.expectation.register(Gaussian, mfn.Identity, NoneType, kernels.Kernel, InducingPoints)
def _expectation_gaussian__kernel_inducingpoints(
    p, identity_mean, _, kernel, inducing_variable, nghp=None
):
    """Prevents infinite recursion (Identity is a subclass of Linear;
    reference ``misc.py:148-160``)."""
    raise NotImplementedError


@dispatch.expectation.register(
    DiagonalGaussian, object, (InducingVariables, NoneType), object, (InducingVariables, NoneType)
)
def _expectation_diagonal_generic(p, obj1, feat1, obj2, feat2, nghp=None):
    """Missing DiagonalGaussian implementations fall back to full Gaussian."""
    gaussian = Gaussian(p.mu, jax.vmap(jnp.diag)(jnp.asarray(p.cov)))
    return expectation(gaussian, (obj1, feat1), (obj2, feat2), nghp=nghp)


@dispatch.expectation.register(
    MarkovGaussian, object, (InducingVariables, NoneType), object, (InducingVariables, NoneType)
)
def _expectation_markov_generic(p, obj1, feat1, obj2, feat2, nghp=None):
    """Missing MarkovGaussian implementations convert to Gaussian where the
    cross-covariance is not needed (reference ``misc.py:186-221``)."""
    if obj2 is None:
        gaussian = Gaussian(p.mu[:-1], p.cov[0, :-1])
        return expectation(gaussian, (obj1, feat1), nghp=nghp)
    elif obj1 is None:
        gaussian = Gaussian(p.mu[1:], p.cov[0, 1:])
        return expectation(gaussian, (obj2, feat2), nghp=nghp)
    else:
        # joint expectation over (x_n, x_{n+1}) with no specific analytic
        # implementation: route to the Markov quadrature fallback (the
        # reference would re-dispatch to this same function)
        raise NotImplementedError
