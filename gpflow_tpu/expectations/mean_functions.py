"""Analytic expectations of mean functions (reference
``/root/reference/gpflow/expectations/mean_functions.py``)."""
from __future__ import annotations

from typing import Type

import jax
import jax.numpy as jnp

from .. import functions as mfn
from ..probability_distributions import Gaussian
from ..utilities.shapes import check_shapes
from . import dispatch
from .expectations import expectation

NoneType: Type[None] = type(None)


@dispatch.expectation.register(Gaussian, (mfn.Linear, mfn.Constant), NoneType, NoneType, NoneType)
@check_shapes("p: [N, D]", "return: [N, Q]")
def _expectation_gaussian_linear(p, mean, _, __, ___, nghp=None):
    """<m(X)>_p(X) for Linear/Identity/Constant means -> [N, Q]."""
    return mean(p.mu)


@dispatch.expectation.register(Gaussian, mfn.Constant, NoneType, mfn.Constant, NoneType)
@check_shapes("p: [N, D]", "return: [N, Q1, Q2]")
def _expectation_gaussian_constant__constant(p, mean1, _, mean2, __, nghp=None):
    return mean1(p.mu)[:, :, None] * mean2(p.mu)[:, None, :]


@dispatch.expectation.register(Gaussian, mfn.Constant, NoneType, mfn.MeanFunction, NoneType)
@check_shapes("p: [N, D]", "return: [N, Q1, Q2]")
def _expectation_gaussian_constant__meanfunction(p, mean1, _, mean2, __, nghp=None):
    e_mean2 = expectation(p, mean2)
    return mean1(p.mu)[:, :, None] * e_mean2[:, None, :]


@dispatch.expectation.register(Gaussian, mfn.MeanFunction, NoneType, mfn.Constant, NoneType)
@check_shapes("p: [N, D]", "return: [N, Q1, Q2]")
def _expectation_gaussian_meanfunction__constant(p, mean1, _, mean2, __, nghp=None):
    e_mean1 = expectation(p, mean1)
    return e_mean1[:, :, None] * mean2(p.mu)[:, None, :]


@dispatch.expectation.register(Gaussian, mfn.Identity, NoneType, mfn.Identity, NoneType)
@check_shapes("p: [N, D]", "return: [N, D, D]")
def _expectation_gaussian_identity__identity(p, mean1, _, mean2, __, nghp=None):
    """<x x^T>_p -> [N, D, D]."""
    return p.cov + (p.mu[:, :, None] * p.mu[:, None, :])


@dispatch.expectation.register(Gaussian, mfn.Identity, NoneType, mfn.Linear, NoneType)
@check_shapes("p: [N, D]", "return: [N, D, Q]")
def _expectation_gaussian_identity__linear(p, mean1, _, mean2, __, nghp=None):
    """<x (Ax + b)^T>_p -> [N, D, Q]."""
    N = p.mu.shape[0]
    A = jnp.asarray(mean2.A)
    b = jnp.asarray(mean2.b)
    e_xxt = p.cov + (p.mu[:, :, None] * p.mu[:, None, :])  # [N, D, D]
    e_xxt_A = jnp.matmul(e_xxt, jnp.broadcast_to(A[None], (N,) + A.shape))  # [N, D, Q]
    e_x_bt = p.mu[:, :, None] * b[None, None, :]  # [N, D, Q]
    return e_xxt_A + e_x_bt


@dispatch.expectation.register(Gaussian, mfn.Linear, NoneType, mfn.Identity, NoneType)
@check_shapes("p: [N, D]", "return: [N, Q, D]")
def _expectation_gaussian_linear__identity(p, mean1, _, mean2, __, nghp=None):
    """<(Ax + b) x^T>_p -> [N, Q, D]."""
    N = p.mu.shape[0]
    A = jnp.asarray(mean1.A)
    b = jnp.asarray(mean1.b)
    e_xxt = p.cov + (p.mu[:, :, None] * p.mu[:, None, :])
    e_A_xxt = jnp.matmul(
        jnp.swapaxes(jnp.broadcast_to(A[None], (N,) + A.shape), -1, -2), e_xxt
    )  # [N, Q, D]
    e_b_xt = b[None, :, None] * p.mu[:, None, :]  # [N, Q, D]
    return e_A_xxt + e_b_xt


@dispatch.expectation.register(Gaussian, mfn.Linear, NoneType, mfn.Linear, NoneType)
@check_shapes("p: [N, D]", "return: [N, Q1, Q2]")
def _expectation_gaussian_linear__linear(p, mean1, _, mean2, __, nghp=None):
    """<m1(x)^T m2(x)>_p for Linear means -> [N, Q1, Q2]."""
    A1 = jnp.asarray(mean1.A)
    b1 = jnp.asarray(mean1.b)
    A2 = jnp.asarray(mean2.A)
    b2 = jnp.asarray(mean2.b)
    e_xxt = p.cov + (p.mu[:, :, None] * p.mu[:, None, :])  # [N, D, D]
    e_A1t_xxt_A2 = jnp.einsum("iq,nij,jz->nqz", A1, e_xxt, A2)
    e_A1t_x_b2t = jnp.einsum("iq,ni,z->nqz", A1, p.mu, b2)
    e_b1_xt_A2 = jnp.einsum("q,ni,iz->nqz", b1, p.mu, A2)
    e_b1_b2t = b1[:, None] * b2[None, :]
    return e_A1t_xxt_A2 + e_A1t_x_b2t + e_b1_xt_A2 + e_b1_b2t
