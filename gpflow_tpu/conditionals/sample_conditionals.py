"""Sampling from conditionals (reference
``/root/reference/gpflow/conditionals/sample_conditionals.py``)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..base import TensorType
from ..utilities.shapes import check_shapes
from ..inducing_variables import InducingVariables
from ..kernels import Kernel
from .dispatch import conditional, sample_conditional
from .util import sample_mvn

__all__ = ["_sample_conditional"]

SamplesMeanAndVariance = Tuple[jax.Array, jax.Array, jax.Array]


@check_shapes(
    "Xnew: [batch..., N, D]",
    "inducing_variable: [M, D, maybe_R...]",
    "f: [M, R]",
    "return[0]: [batch..., N, R] if num_samples is None",
    "return[0]: [batch..., num_samples, N, R] if num_samples is not None",
    "return[1]: [batch..., N, R]",
    "return[2]: [batch..., N, R] if (not full_cov) and (not full_output_cov)",
    "return[2]: [batch..., R, N, N] if full_cov and (not full_output_cov)",
    "return[2]: [batch..., N, R, R] if (not full_cov) and full_output_cov",
)
def _sample_conditional(
    Xnew: TensorType,
    inducing_variable,
    kernel: Kernel,
    f: TensorType,
    *,
    full_cov: bool = False,
    full_output_cov: bool = False,
    q_sqrt: Optional[TensorType] = None,
    white: bool = False,
    num_samples: Optional[int] = None,
    key: Optional[jax.Array] = None,
) -> SamplesMeanAndVariance:
    """Returns (samples, mean, cov) from the conditional distribution
    (reference ``sample_conditionals.py:27-91``)."""
    if full_cov and full_output_cov:
        raise NotImplementedError(
            "The combination of both `full_cov` and `full_output_cov` is not permitted."
        )

    mean, cov = conditional(
        Xnew,
        inducing_variable,
        kernel,
        f,
        q_sqrt=q_sqrt,
        white=white,
        full_cov=full_cov,
        full_output_cov=full_output_cov,
    )
    if full_cov:
        # mean: [..., N, P]; cov: [..., P, N, N]
        mean_for_sample = jnp.swapaxes(mean, -1, -2)  # [..., P, N]
        samples = sample_mvn(mean_for_sample, cov, full_cov=True, num_samples=num_samples, key=key)
        samples = jnp.swapaxes(samples, -1, -2)  # [..., (S), N, P]
    else:
        samples = sample_mvn(mean, cov, full_cov=full_output_cov, num_samples=num_samples, key=key)

    return samples, mean, cov


sample_conditional.add((object, object, Kernel, object), _sample_conditional)
sample_conditional.add((object, InducingVariables, Kernel, object), _sample_conditional)
