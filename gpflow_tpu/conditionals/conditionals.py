"""Single-output conditional registrations (reference
``/root/reference/gpflow/conditionals/conditionals.py``)."""
from __future__ import annotations

from typing import Optional

import jax

from ..base import MeanAndVariance, TensorType
from ..utilities.shapes import check_shapes
from ..inducing_variables import InducingVariables
from ..kernels import Kernel
from ..posteriors import VGPPosterior, get_posterior_class
from .dispatch import conditional

__all__ = ["_dense_conditional", "_sparse_conditional"]


@conditional.register(object, InducingVariables, Kernel, object)
@check_shapes(
    "Xnew: [batch..., N, D]",
    "inducing_variable: [M, D, maybe_R...]",
    "f: [M, R]",
    "q_sqrt: [M, R] | [R, M, M]",
    "return[0]: [batch..., N, R]",
    "return[1]: [batch..., N, R] if (not full_cov) and (not full_output_cov)",
    "return[1]: [batch..., R, N, N] if full_cov and (not full_output_cov)",
    "return[1]: [batch..., N, R, R] if (not full_cov) and full_output_cov",
    "return[1]: [batch..., N, R, N, R] if full_cov and full_output_cov",
)
def _sparse_conditional(
    Xnew: TensorType,
    inducing_variable: InducingVariables,
    kernel: Kernel,
    f: TensorType,
    *,
    full_cov: bool = False,
    full_output_cov: bool = False,
    q_sqrt: Optional[TensorType] = None,
    white: bool = False,
) -> MeanAndVariance:
    """Single-output sparse GP conditional: builds the dispatched posterior
    class and calls fused_predict_f (reference ``conditionals.py:27-87``)."""
    posterior_class = get_posterior_class(kernel, inducing_variable)
    posterior = posterior_class(
        kernel,
        inducing_variable,
        f,
        q_sqrt,
        whiten=white,
        mean_function=None,
        precompute_cache=None,
    )
    return posterior.fused_predict_f(Xnew, full_cov=full_cov, full_output_cov=full_output_cov)


@conditional.register(object, object, Kernel, object)
@check_shapes(
    "Xnew: [batch..., N, D]",
    "X: [M, D]",
    "f: [M, R]",
    "q_sqrt: [M, R] | [R, M, M]",
    "return[0]: [batch..., N, R]",
    "return[1]: [batch..., N, R] if (not full_cov) and (not full_output_cov)",
    "return[1]: [batch..., R, N, N] if full_cov and (not full_output_cov)",
    "return[1]: [batch..., N, R, R] if (not full_cov) and full_output_cov",
    "return[1]: [batch..., N, R, N, R] if full_cov and full_output_cov",
)
def _dense_conditional(
    Xnew: TensorType,
    X: TensorType,
    kernel: Kernel,
    f: TensorType,
    *,
    full_cov: bool = False,
    full_output_cov: bool = False,
    q_sqrt: Optional[TensorType] = None,
    white: bool = False,
) -> MeanAndVariance:
    """GP conditional on function values at data points X
    (reference ``conditionals.py:90-156``)."""
    posterior = VGPPosterior(
        kernel=kernel, X=X, q_mu=f, q_sqrt=q_sqrt, white=white, precompute_cache=None
    )
    return posterior.fused_predict_f(Xnew, full_cov=full_cov, full_output_cov=full_output_cov)
