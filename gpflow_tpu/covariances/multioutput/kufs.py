"""Multioutput Kuf registrations (reference
``/root/reference/gpflow/covariances/multioutput/kufs.py``)."""
from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

from ...base import TensorType
from ...inducing_variables import (
    FallbackSeparateIndependentInducingVariables,
    FallbackSharedIndependentInducingVariables,
    InducingPoints,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)
from ...kernels import (
    LinearCoregionalization,
    MultioutputKernel,
    SeparateIndependent,
    SharedIndependent,
)
from ...utilities.shapes import check_shapes
from ..dispatch import Kuf

__all__ = [
    "Kuf_fallback_separate_linear_coregionalization",
    "Kuf_fallback_shared_linear_coregionalization",
    "Kuf_generic",
    "Kuf_separate_linear_coregionalization",
    "Kuf_separate_separate",
    "Kuf_separate_shared",
    "Kuf_shared_linear_coregionalization",
    "Kuf_shared_separate",
    "Kuf_shared_shared",
]


@Kuf.register(InducingPoints, MultioutputKernel, object)
@check_shapes("Xnew: [N, D]", "return: [M, P, N, P]")
def Kuf_generic(
    inducing_variable: InducingPoints, kernel: MultioutputKernel, Xnew: TensorType
) -> jax.Array:
    """[M, P, N, P] fully-correlated (reference ``mo/kufs.py:37-46``)."""
    return kernel(inducing_variable.Z.value, Xnew, full_cov=True, full_output_cov=True)


@Kuf.register(SharedIndependentInducingVariables, SharedIndependent, object)
@check_shapes("Xnew: [batch..., N, D]", "return: [M, batch..., N]")
def Kuf_shared_shared(
    inducing_variable: SharedIndependentInducingVariables,
    kernel: SharedIndependent,
    Xnew: TensorType,
) -> jax.Array:
    """[M, N] (reference ``mo/kufs.py:49-60``)."""
    return Kuf(inducing_variable.inducing_variable, kernel.kernel, Xnew)


@Kuf.register(SeparateIndependentInducingVariables, SharedIndependent, object)
@check_shapes("Xnew: [batch..., N, D]", "return: [L, M, batch..., N]")
def Kuf_separate_shared(
    inducing_variable: SeparateIndependentInducingVariables,
    kernel: SharedIndependent,
    Xnew: TensorType,
) -> jax.Array:
    """[L, M, N] (reference ``mo/kufs.py:63-76``)."""
    return jnp.stack(
        [Kuf(f, kernel.kernel, Xnew) for f in inducing_variable.inducing_variable_list], axis=0
    )


@Kuf.register(SharedIndependentInducingVariables, SeparateIndependent, object)
@check_shapes("Xnew: [batch..., N, D]", "return: [L, M, batch..., N]")
def Kuf_shared_separate(
    inducing_variable: SharedIndependentInducingVariables,
    kernel: SeparateIndependent,
    Xnew: TensorType,
) -> jax.Array:
    """[L, M, N] (reference ``mo/kufs.py:79-92``)."""
    return jnp.stack(
        [Kuf(inducing_variable.inducing_variable, k, Xnew) for k in kernel.kernels], axis=0
    )


@Kuf.register(SeparateIndependentInducingVariables, SeparateIndependent, object)
@check_shapes("Xnew: [batch..., N, D]", "return: [L, M, batch..., N]")
def Kuf_separate_separate(
    inducing_variable: SeparateIndependentInducingVariables,
    kernel: SeparateIndependent,
    Xnew: TensorType,
) -> jax.Array:
    """[L, M, N] (reference ``mo/kufs.py:95-115``)."""
    n_iv = len(inducing_variable.inducing_variable_list)
    n_k = len(kernel.kernels)
    assert n_iv == n_k, (
        f"Must have same number of inducing variables and kernels. Found {n_iv} and {n_k}."
    )
    return jnp.stack(
        [Kuf(f, k, Xnew) for f, k in zip(inducing_variable.inducing_variable_list, kernel.kernels)],
        axis=0,
    )


def _fallback_Kuf(
    kuf_impl: Callable[..., jax.Array],
    inducing_variable: Union[
        FallbackSeparateIndependentInducingVariables,
        FallbackSharedIndependentInducingVariables,
    ],
    kernel: LinearCoregionalization,
    Xnew: TensorType,
) -> jax.Array:
    """[M, L, N, P] = Kuf_latent[:, l, :, None] * W[None, l, None, :]
    (reference ``mo/kufs.py:118-136``)."""
    K = jnp.transpose(kuf_impl(inducing_variable, kernel, Xnew), (1, 0, 2))  # [M, L, N]
    return K[:, :, :, None] * jnp.transpose(kernel.W.value)[None, :, None, :]


@Kuf.register(FallbackSeparateIndependentInducingVariables, LinearCoregionalization, object)
@check_shapes("Xnew: [N, D]", "return: [M, L, N, P]")
def Kuf_fallback_separate_linear_coregionalization(
    inducing_variable: FallbackSeparateIndependentInducingVariables,
    kernel: LinearCoregionalization,
    Xnew: TensorType,
) -> jax.Array:
    """[M, L, N, P] (reference ``mo/kufs.py:139-158``)."""
    return _fallback_Kuf(Kuf_separate_linear_coregionalization, inducing_variable, kernel, Xnew)


@Kuf.register(FallbackSharedIndependentInducingVariables, LinearCoregionalization, object)
@check_shapes("Xnew: [N, D]", "return: [M, L, N, P]")
def Kuf_fallback_shared_linear_coregionalization(
    inducing_variable: FallbackSharedIndependentInducingVariables,
    kernel: LinearCoregionalization,
    Xnew: TensorType,
) -> jax.Array:
    """[M, L, N, P] (reference ``mo/kufs.py:161-180``)."""
    return _fallback_Kuf(Kuf_shared_linear_coregionalization, inducing_variable, kernel, Xnew)


@Kuf.register(SharedIndependentInducingVariables, LinearCoregionalization, object)
@check_shapes("Xnew: [batch..., N, D]", "return: [L, M, batch..., N]")
def Kuf_shared_linear_coregionalization(
    inducing_variable: SharedIndependentInducingVariables,
    kernel: LinearCoregionalization,
    Xnew: TensorType,
) -> jax.Array:
    """[L, M, N] (reference ``mo/kufs.py:183-198``)."""
    return jnp.stack(
        [Kuf(inducing_variable.inducing_variable, k, Xnew) for k in kernel.kernels], axis=0
    )


@Kuf.register(SeparateIndependentInducingVariables, LinearCoregionalization, object)
@check_shapes("Xnew: [batch..., N, D]", "return: [L, M, batch..., N]")
def Kuf_separate_linear_coregionalization(
    inducing_variable: SeparateIndependentInducingVariables,
    kernel: LinearCoregionalization,
    Xnew: TensorType,
) -> jax.Array:
    """[L, M, N] (reference ``mo/kufs.py:201-224``)."""
    n_iv = len(inducing_variable.inducing_variable_list)
    n_k = len(kernel.kernels)
    assert n_iv == n_k, (
        f"Must have same number of inducing variables and kernels. Found {n_iv} and {n_k}."
    )
    return jnp.stack(
        [Kuf(f, k, Xnew) for f, k in zip(inducing_variable.inducing_variable_list, kernel.kernels)],
        axis=0,
    )
