"""Single-output Kuu registrations (reference ``/root/reference/gpflow/covariances/kuus.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float
from ..inducing_variables import InducingPatches, InducingPoints, Multiscale
from ..kernels import Convolutional, Kernel, SquaredExponential
from ..utilities.shapes import check_shapes
from .dispatch import Kuu

__all__ = ["Kuu_conv_patch", "Kuu_kernel_inducingpoints", "Kuu_sqexp_multiscale"]


@Kuu.register(InducingPoints, Kernel)
@check_shapes("return: [M, M]")
def Kuu_kernel_inducingpoints(
    inducing_variable: InducingPoints, kernel: Kernel, *, jitter: float = 0.0
) -> jax.Array:
    """K(Z) + jitter I -> [M, M] (reference ``kuus.py:24-34``)."""
    Kzz = kernel(inducing_variable.Z.value)
    Kzz += jitter * jnp.eye(inducing_variable.num_inducing, dtype=Kzz.dtype)
    return Kzz


@Kuu.register(Multiscale, SquaredExponential)
@check_shapes("return: [M, M]")
def Kuu_sqexp_multiscale(
    inducing_variable: Multiscale, kernel: SquaredExponential, *, jitter: float = 0.0
) -> jax.Array:
    """Multiscale-RBF closed form (reference ``kuus.py:37-53``)."""
    Zmu, Zlen = kernel.slice(inducing_variable.Z.value, inducing_variable.scales.value)
    idlengthscales2 = jnp.square(kernel.lengthscales + Zlen)
    sc = jnp.sqrt(
        idlengthscales2[None, ...] + idlengthscales2[:, None, ...] - kernel.lengthscales.value ** 2
    )
    d = inducing_variable._cust_square_dist(Zmu, Zmu, sc)
    Kzz = kernel.variance * jnp.exp(-d / 2) * jnp.prod(kernel.lengthscales / sc, 2)
    Kzz += jitter * jnp.eye(inducing_variable.num_inducing, dtype=Kzz.dtype)
    return Kzz


@Kuu.register(InducingPatches, Convolutional)
@check_shapes("return: [M, M]")
def Kuu_conv_patch(
    inducing_variable: InducingPatches, kernel: Convolutional, *, jitter: float = 0.0
) -> jax.Array:
    """Patch-space Kuu (reference ``kuus.py:56-66``)."""
    return kernel.base_kernel.K(inducing_variable.Z.value) + jitter * jnp.eye(
        inducing_variable.num_inducing, dtype=default_float()
    )
