"""Efficient multioutput sampling (reference
``/root/reference/gpflow/conditionals/multioutput/sample_conditionals.py:30-77``)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...base import TensorType
from ...utilities.shapes import check_shapes
from ...inducing_variables import (
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)
from ...kernels import LinearCoregionalization, SeparateIndependent
from ..dispatch import conditional, sample_conditional
from ..util import mix_latent_gp, sample_mvn

__all__ = ["_sample_conditional_coregionalization"]


@check_shapes(
    "Xnew: [batch..., N, D]",
    "inducing_variable: [M, D, maybe_L...]",
    "f: [M, L]",
    "return[0]: [batch..., N, P] if num_samples is None",
    "return[0]: [batch..., num_samples, N, P] if num_samples is not None",
    "return[1]: [batch..., N, P]",
    "return[2]: [batch..., N, P] if (not full_cov) and (not full_output_cov)",
    "return[2]: [batch..., P, N, N] if full_cov and (not full_output_cov)",
    "return[2]: [batch..., N, P, P] if (not full_cov) and full_output_cov",
    "return[2]: [batch..., N, P, N, P] if full_cov and full_output_cov",
)
def _sample_conditional_coregionalization(
    Xnew: TensorType,
    inducing_variable,
    kernel: LinearCoregionalization,
    f: TensorType,
    *,
    full_cov: bool = False,
    full_output_cov: bool = False,
    q_sqrt: Optional[TensorType] = None,
    white: bool = False,
    num_samples: Optional[int] = None,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Samples in g-space (L latent GPs) then mixes with W — cheaper than
    sampling the P-output covariance.

    ``full_cov`` and ``full_output_cov`` are both supported (the reference
    raises ``NotImplementedError`` for either flag,
    ``multioutput/sample_conditionals.py:53``): the L latent GPs are
    independent, so each latent's [N, N] posterior is sampled as one
    N-dimensional MVN and both the joint-over-N and the across-output
    correlation structure survive the linear mixing f = g Wᵀ exactly —
    ``full_output_cov`` only changes the *returned moment* layout
    (``mix_latent_gp`` handles all four combinations), never the samples.
    """

    ind_conditional = conditional.dispatch_or_raise(
        object, SeparateIndependentInducingVariables, SeparateIndependent, object
    )
    g_mu, g_var = ind_conditional(
        Xnew, inducing_variable, kernel, f, white=white, q_sqrt=q_sqrt, full_cov=full_cov
    )  # g_mu: [..., N, L]; g_var: [..., N, L] or [..., L, N, N] (full_cov)
    if full_cov:
        # Per-latent N-dim MVNs: treat L as the sample_mvn batch dim and N as
        # the event dim, then restore the [..., N, L] layout.
        g_mu_t = jnp.swapaxes(g_mu, -1, -2)  # [..., L, N]
        g_sample = sample_mvn(g_mu_t, g_var, True, num_samples=num_samples, key=key)
        g_sample = jnp.swapaxes(g_sample, -1, -2)  # [..., (S,) N, L]
        g_var_mix = jnp.moveaxis(g_var, -3, 0)  # [L, ..., N, N] for mix_latent_gp
    else:
        g_sample = sample_mvn(g_mu, g_var, False, num_samples=num_samples, key=key)
        g_var_mix = g_var
    f_mu, f_var = mix_latent_gp(kernel.W.value, g_mu, g_var_mix, full_cov, full_output_cov)
    f_sample = jnp.tensordot(g_sample, kernel.W.value, [[-1], [-1]])
    return f_sample, f_mu, f_var


sample_conditional.add(
    (object, SharedIndependentInducingVariables, LinearCoregionalization, object),
    _sample_conditional_coregionalization,
)
sample_conditional.add(
    (object, SeparateIndependentInducingVariables, LinearCoregionalization, object),
    _sample_conditional_coregionalization,
)
