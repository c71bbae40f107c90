"""Multioutput Kuu registrations (reference
``/root/reference/gpflow/covariances/multioutput/kuus.py``)."""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from ...inducing_variables import (
    FallbackSeparateIndependentInducingVariables,
    FallbackSharedIndependentInducingVariables,
    InducingPoints,
)
from ...kernels import (
    IndependentLatent,
    LinearCoregionalization,
    MultioutputKernel,
    SeparateIndependent,
    SharedIndependent,
)
from ...utilities.shapes import check_shapes
from ..dispatch import Kuu

__all__ = [
    "Kuu_fallbace_separate",
    "Kuu_fallback_separate",
    "Kuu_fallback_separate_shared",
    "Kuu_fallback_shared",
    "Kuu_generic",
    "Kuu_shared_shared",
]


@Kuu.register(InducingPoints, MultioutputKernel)
@check_shapes("return: [M, P, M, P]")
def Kuu_generic(
    inducing_variable: InducingPoints, kernel: MultioutputKernel, *, jitter: float = 0.0
) -> jax.Array:
    """Fully-correlated [M, P, M, P] (reference ``mo/kuus.py:35-47``)."""
    Kmm = kernel(inducing_variable.Z.value, full_cov=True, full_output_cov=True)
    M = Kmm.shape[0] * Kmm.shape[1]
    jittermat = jitter * jnp.reshape(jnp.eye(M, dtype=Kmm.dtype), Kmm.shape)
    return Kmm + jittermat


@Kuu.register(FallbackSharedIndependentInducingVariables, SharedIndependent)
@check_shapes("return: [M, M]")
def Kuu_shared_shared(
    inducing_variable: FallbackSharedIndependentInducingVariables,
    kernel: SharedIndependent,
    *,
    jitter: float = 0.0,
) -> jax.Array:
    """[M, M] (reference ``mo/kuus.py:50-63``)."""
    Kmm = Kuu(inducing_variable.inducing_variable, kernel.kernel)
    return Kmm + jitter * jnp.eye(inducing_variable.num_inducing, dtype=Kmm.dtype)


@check_shapes("return: [L, M, M]")
def _kuu_fallback_shared(
    inducing_variable: FallbackSharedIndependentInducingVariables,
    kernel: Union[SeparateIndependent, IndependentLatent],
    *,
    jitter: float = 0.0,
) -> jax.Array:
    """[L, M, M] (reference ``mo/kuus.py:66-79``)."""
    Kmm = jnp.stack(
        [Kuu(inducing_variable.inducing_variable, k) for k in kernel.kernels], axis=0
    )
    jittermat = jnp.eye(inducing_variable.num_inducing, dtype=Kmm.dtype)[None, :, :] * jitter
    return Kmm + jittermat


Kuu_fallback_shared = _kuu_fallback_shared
Kuu.add((FallbackSharedIndependentInducingVariables, SeparateIndependent), _kuu_fallback_shared)
Kuu.add((FallbackSharedIndependentInducingVariables, IndependentLatent), _kuu_fallback_shared)


@Kuu.register(FallbackSeparateIndependentInducingVariables, SharedIndependent)
@check_shapes("return: [L, M, M]")
def Kuu_fallback_separate_shared(
    inducing_variable: FallbackSeparateIndependentInducingVariables,
    kernel: SharedIndependent,
    *,
    jitter: float = 0.0,
) -> jax.Array:
    """[L, M, M] (reference ``mo/kuus.py:82-95``)."""
    Kmm = jnp.stack(
        [Kuu(f, kernel.kernel) for f in inducing_variable.inducing_variable_list], axis=0
    )
    jittermat = jnp.eye(inducing_variable.num_inducing, dtype=Kmm.dtype)[None, :, :] * jitter
    return Kmm + jittermat


@check_shapes("return: [L, M, M]")
def _kuu_fallback_separate(
    inducing_variable: FallbackSeparateIndependentInducingVariables,
    kernel: Union[SeparateIndependent, LinearCoregionalization],
    *,
    jitter: float = 0.0,
) -> jax.Array:
    """[L, M, M] per-latent pairing (reference ``mo/kuus.py:98-121``)."""
    n_iv = len(inducing_variable.inducing_variable_list)
    n_k = len(kernel.kernels)
    assert n_iv == n_k, (
        f"Must have same number of inducing variables and kernels. Found {n_iv} and {n_k}."
    )
    Kmm = jnp.stack(
        [Kuu(f, k) for f, k in zip(inducing_variable.inducing_variable_list, kernel.kernels)],
        axis=0,
    )
    jittermat = jnp.eye(inducing_variable.num_inducing, dtype=Kmm.dtype)[None, :, :] * jitter
    return Kmm + jittermat


Kuu_fallback_separate = _kuu_fallback_separate
# the reference exports this registration under a typo'd name
# (``mo/kuus.py:98`` "Kuu_fallbace_separate"); kept as an import-level alias
Kuu_fallbace_separate = _kuu_fallback_separate
Kuu.add((FallbackSeparateIndependentInducingVariables, SeparateIndependent), _kuu_fallback_separate)
Kuu.add(
    (FallbackSeparateIndependentInducingVariables, LinearCoregionalization),
    _kuu_fallback_separate,
)
