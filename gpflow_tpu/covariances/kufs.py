"""Single-output Kuf registrations (reference ``/root/reference/gpflow/covariances/kufs.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base import TensorType
from ..inducing_variables import InducingPatches, InducingPoints, Multiscale
from ..kernels import Convolutional, Kernel, SquaredExponential
from ..utilities.shapes import check_shapes
from .dispatch import Kuf

__all__ = ["Kuf_conv_patch", "Kuf_kernel_inducingpoints", "Kuf_sqexp_multiscale"]


@Kuf.register(InducingPoints, Kernel, object)
@check_shapes("Xnew: [batch..., N, D]", "return: [M, batch..., N]")
def Kuf_kernel_inducingpoints(
    inducing_variable: InducingPoints, kernel: Kernel, Xnew: TensorType
) -> jax.Array:
    """K(Z, Xnew) -> [M, batch..., N] (reference ``kufs.py:35-44``)."""
    return kernel(inducing_variable.Z.value, Xnew)


@Kuf.register(Multiscale, SquaredExponential, object)
@check_shapes("Xnew: [N, D]", "return: [M, N]")
def Kuf_sqexp_multiscale(
    inducing_variable: Multiscale, kernel: SquaredExponential, Xnew: TensorType
) -> jax.Array:
    """Multiscale-RBF cross covariance (reference ``kufs.py:47-60``)."""
    Xnew, _ = kernel.slice(Xnew, None)
    Zmu, Zlen = kernel.slice(inducing_variable.Z.value, inducing_variable.scales.value)
    idlengthscales = kernel.lengthscales + Zlen
    d = inducing_variable._cust_square_dist(Xnew, Zmu, idlengthscales[None, :, :])
    lengthscales = jnp.prod(kernel.lengthscales / idlengthscales, 1)
    lengthscales = jnp.reshape(lengthscales, (1, -1))
    return jnp.transpose(kernel.variance * jnp.exp(-0.5 * d) * lengthscales)


@Kuf.register(InducingPatches, Convolutional, object)
@check_shapes("return: [M, N]")
def Kuf_conv_patch(
    inducing_variable: InducingPatches, kernel: Convolutional, Xnew: TensorType
) -> jax.Array:
    """Weighted patch response [M, N] (reference ``kufs.py:63-76``)."""
    Xp = kernel.get_patches(Xnew)  # [N, num_patches, patch_len]
    bigKzx = kernel.base_kernel.K(inducing_variable.Z.value, Xp)  # [M, N, P]
    Kzx = jnp.sum(bigKzx * kernel.weights.value, axis=2)
    return Kzx / kernel.num_patches
